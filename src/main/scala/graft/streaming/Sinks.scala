package graft.streaming

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sink configurations mirroring the reference's delivery targets
  * (SURVEY §2.4 K1-K3). These compile against stock Spark; the Kafka
  * connector / JDBC driver jars are deploy-time classpath additions.
  */
object Sinks {

  /** K1: async batched Kafka sink with the reference publisher's
    * tuning (`publisher/internal/kafka/publisher.go:34-49`:
    * BatchSize 100, BatchTimeout 1 s, acks=1; null keys —
    * `handler.go:81` publishes with nil key, so we only emit a
    * `value` column and let the default partitioner spread load,
    * the `LeastBytes` analog).
    */
  def kafkaSink(df: DataFrame, bootstrap: String,
                checkpointDir: String, // no default: the checkpoint must be durable AND unique per query — a shared /tmp default collides across queries and vanishes on reboot (review-caught)
                topic: String = "ingest-topic"): DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("kafka.batch.size", "16384")
      .option("kafka.linger.ms", "1000") // BatchTimeout 1 s analog
      .option("kafka.acks", "1")         // RequireOne
      .option("checkpointLocation", checkpointDir)

  /** K2/K3: JDBC batch INSERT sink for a micro-batch — the
    * `foreachBatch` body (`writeStream.foreachBatch(jdbcBatch(url,
    * table, props))`). Batch size 100 matches both reference
    * consumers (`application.yml:53`,
    * `consumer2/.../KafkaMessageConsumer.kt:30`); `numPartitions`
    * caps writer-side connections like their Hikari pools (max 10).
    *
    * @param columnTypes optional explicit DDL column types for the
    *   auto-created table (`createTableColumnTypes`), the analog of
    *   the reference's hand-written ClickHouse DDL
    *   (`consumer/clickhouse/init-db.sh:20-36`) — e.g. Derby/most
    *   RDBMS want `VARCHAR(n)` where Spark would default string
    *   columns to unindexable CLOB/TEXT.
    */
  def jdbcBatch(url: String, table: String, connProps: Properties,
                batchSize: Int = 100, maxConnections: Int = 10,
                columnTypes: Option[String] = None): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        val w = batch
          .coalesce(maxConnections)
          .write
          .mode(SaveMode.Append)
          .option("batchsize", batchSize)
        columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
          .jdbc(url, table, connProps)
      }
}
