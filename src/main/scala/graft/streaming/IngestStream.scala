package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, StreamingQuery, Trigger}

import graft.operators.IngestPipeline

/** The reference's streaming ETL pipeline (SURVEY §2: S3/S4 sources,
  * K1-K3 sinks, D1-D3/D5-D7 delivery semantics), re-expressed as one
  * Structured Streaming query.
  *
  * Delivery contract (the union of the two reference consumers,
  * SURVEY §7.4):
  *  - parse failures are diverted to a DLQ, never fail the batch —
  *    offsets advance even when EVERY record is malformed
  *    (`consumer2/.../MessageProcessor.kt:48-52`, D3);
  *  - sink failures rethrow out of `foreachBatch`, so the checkpoint
  *    does NOT commit and the batch is replayed on restart —
  *    at-least-once commit-after-write
  *    (`consumer/.../IngestKafkaListener.kt:51-60`, D1/D2);
  *  - empty micro-batches short-circuit before touching the sink
  *    (`IngestKafkaListener.kt:33-36`, F7).
  */
object IngestStream {

  /** S3/S4: the Kafka source, configured like the reference's
    * consumers (`ingest-topic`, earliest, bounded batches ≈ the
    * 100-record/5 s hybrid flush via maxOffsetsPerTrigger + the
    * processing-time trigger in [[start]]). Compiles without the
    * connector jar; requires spark-sql-kafka on the cluster
    * classpath at runtime.
    */
  def kafkaSource(spark: SparkSession, bootstrap: String,
                  topic: String = "ingest-topic",
                  maxOffsetsPerTrigger: Long = 100L): DataStreamReader =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)

  /** Kafka wire format → the ingest schema: raw value bytes as the
    * JSON payload column, the record key as the api key (the
    * reference publishes with nil key, `handler.go:81` — hence
    * nullable).
    */
  def fromKafka(kafka: DataFrame): DataFrame =
    kafka.selectExpr(
      "CAST(key AS STRING) AS user_id",
      "CAST(value AS STRING) AS props")

  /** One micro-batch of the ingest contract: split the batch into
    * accepted / DLQ, append both as parquet. Any sink failure
    * propagates (→ no offset commit → replay).
    */
  def processBatch(batch: DataFrame, keys: DataFrame, outDir: String,
                   dlqDir: String, receivedAt: Option[Column]): Unit = {
    if (!batch.isEmpty) { // F7: empty-batch short-circuit
      val parsed = IngestPipeline.parse(batch).cache()
      try {
        IngestPipeline
          .enriched(
            IngestPipeline.admitted(
              IngestPipeline.validated(parsed, keys)),
            receivedAt)
          .write.mode("append").parquet(outDir)
        // D3: malformed rows land in the DLQ and the batch still
        // succeeds — poison messages are never re-polled forever.
        IngestPipeline.rejectedMalformed(parsed)
          .write.mode("append").parquet(dlqDir)
      } finally parsed.unpersist()
    }
  }

  /** Start the checkpointed streaming query. The trigger mirrors the
    * reference's 5 s flush; pair with `maxOffsetsPerTrigger` on the
    * source for the 100-record bound (D7 backpressure).
    */
  def start(source: DataFrame, keys: DataFrame, outDir: String,
            dlqDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
            receivedAt: Option[Column] = None,
            queryName: String = "graft-ingest"): StreamingQuery =
    source.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, keys, outDir, dlqDir, receivedAt)
      }
      .start()

  /** D5: poll-error retry with backoff — restart the query from its
    * checkpoint on failure (the Spark analog of
    * `KafkaMessageConsumer.kt:68-72`'s log-delay-continue loop).
    * Returns when the query stops cleanly or retries are exhausted
    * (rethrows the last failure).
    */
  def runWithRetry(mkQuery: () => StreamingQuery, maxRetries: Int = 3,
                   backoffMs: Long = 5000L): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      val q = mkQuery()
      try {
        q.awaitTermination()
        done = true
      } catch {
        case e: Throwable =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(backoffMs)
      }
    }
  }

  /** D6: graceful shutdown — stop the trigger loop and wait for the
    * in-flight micro-batch to commit (micro-batch atomicity makes
    * the flush-on-close of `publisher.go:83-94` implicit).
    */
  def stopGracefully(q: StreamingQuery, timeoutMs: Long = 30000L): Unit = {
    q.stop()
    q.awaitTermination(timeoutMs)
  }
}
