package graft.streaming

import java.nio.file.Files
import java.util.Properties
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** K2/K3 runtime verification: [[Sinks.jdbcBatch]] executed against
  * an embedded Derby database (the Derby jars ship with Spark), not
  * just config-level compilation. Mirrors the reference's
  * Testcontainers integration test
  * (`consumer2/src/test/kotlin/.../ClickHouseRepositoryIntegrationTest.kt:21-237`):
  * stream in → batched JDBC INSERT → read back and assert exact
  * values including SQL NULLs; and the at-least-once contract — a
  * failed batch commits no offsets, the restarted query replays it.
  */
case class SensorRow(sensor_id: String, temperature: Option[Double],
                     ts: String, value: Option[Int], message: Option[String])

/** Derby types Spark strings as CLOB by default and its strict
  * `setNull(CLOB)` rejects VARCHAR columns — register a dialect
  * typing strings as VARCHAR, the per-database dialect shim a real
  * deployment would ship for its target warehouse.
  */
object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
  override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
  override def getJDBCType(dt: org.apache.spark.sql.types.DataType): Option[org.apache.spark.sql.jdbc.JdbcType] =
    dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(256)", java.sql.Types.VARCHAR))
      case _ => None
    }
}

class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  private val url = "jdbc:derby:memory:graftsink;create=true"
  private def connProps: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }
  private def tmp(): String =
    Files.createTempDirectory("graft-jdbc").toString

  // Derby defaults Spark string columns to CLOB, which cannot take
  // pushed-down comparisons — declare VARCHARs like the reference's
  // explicit DDL declares String columns
  private val ddlTypes =
    "sensor_id VARCHAR(64), ts VARCHAR(64), message VARCHAR(256)"

  private val rows = Seq(
    SensorRow("sensor1", Some(25.5), "2023-01-01T10:00:00Z", Some(1), Some("ok")),
    // the null-preserving binding row (P5): absent fields are SQL
    // NULLs at the sink, mirroring `ClickHouseRepository.kt:70-75`
    SensorRow("sensor2", None, "2023-01-01T11:00:00Z", None, None),
    SensorRow("sensor1", Some(26.0), "2023-01-01T12:00:00Z", Some(2), Some("warm")))

  test("streamed micro-batches land in Derby via the batched JDBC writer; NULLs preserved (K2/K3)") {
    val ckpt = tmp()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorRow]
    ms.addData(rows)
    val q = ms.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(Sinks.jdbcBatch(url, "ingest_data", connProps, columnTypes = Some(ddlTypes)))
      .start()
    q.awaitTermination(60000)

    val back = spark.read.jdbc(url, "ingest_data", connProps)
    assert(back.count() === 3)
    // Q2-style filter + sort read-back, exact values
    val s1 = back.filter(col("sensor_id") === "sensor1").orderBy(col("ts"))
      .select(col("temperature"), col("value"), col("message"))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getString(2))).toSeq
    assert(s1 === Seq((25.5, 1, "ok"), (26.0, 2, "warm")))
    // SQL NULLs survived the prepared-statement binding
    val s2 = back.filter(col("sensor_id") === "sensor2").collect()
    assert(s2.length === 1)
    assert(s2(0).isNullAt(s2(0).fieldIndex("temperature")))
    assert(s2(0).isNullAt(s2(0).fieldIndex("value")))
    assert(s2(0).isNullAt(s2(0).fieldIndex("message")))
  }

  test("failed JDBC batch commits no offsets; restart replays and lands exactly the batch (D1/D2 over JDBC)") {
    val ckpt = tmp()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorRow]
    ms.addData(rows)
    val failOnce = new AtomicBoolean(true)
    def start() = ms.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (failOnce.getAndSet(false)) sys.error("simulated database outage")
        Sinks.jdbcBatch(url, "ingest_replay", connProps, columnTypes = Some(ddlTypes))(batch, id)
      }
      .start()
    val q1 = start()
    intercept[Exception] { q1.awaitTermination(60000) }
    // no partial state visible: the failure happened before any write
    val q2 = start()
    q2.awaitTermination(60000)
    assert(spark.read.jdbc(url, "ingest_replay", connProps).count() === 3)
  }

  test("append batches accumulate like repeated executeBatch inserts (K3 batch accounting)") {
    val ckpt = tmp()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SensorRow]
    val sink = Sinks.jdbcBatch(url, "ingest_acc", connProps, columnTypes = Some(ddlTypes))
    ms.addData(rows.take(2))
    val q1 = ms.toDF().writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).foreachBatch(sink).start()
    q1.awaitTermination(60000)
    ms.addData(rows.drop(2))
    val q2 = ms.toDF().writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).foreachBatch(sink).start()
    q2.awaitTermination(60000)
    assert(spark.read.jdbc(url, "ingest_acc", connProps).count() === 3)
  }
}
