package graft.streaming

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Snapshots

/** End-to-end CDC delivery: [[graft.operators.Snapshots.processNewVersions]]
  * (at-least-once per version) composed with [[Sinks.jdbcExactlyOnce]]
  * (version number as the batch id) must land every changelog row in
  * Derby EXACTLY once across a crash-and-replay — the composition the
  * two operators' docs each claim; this spec is the proof that the
  * claims compose.
  */
class CdcDeliverySpec extends SparkSpec {
  import spark.implicits._

  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  private val url = "jdbc:derby:memory:graftcdc;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def df(vals: Long*) = vals.toDF("id")
    .withColumn("payload", concat(lit("row-"), col("id")))

  test("snapshot changelog -> exactly-once JDBC: crash replay lands every change once") {
    val dir = Files.createTempDirectory("graft-cdc").toString
    val cursor = Files.createTempDirectory("graft-cdc-cur").resolve("cursor").toString
    val (target, ledger) = ("cdc_target", "cdc_ledger")
    val sink = Sinks.jdbcExactlyOnce(url, target, ledger, props,
      columnTypes = Some("status VARCHAR(16)"))

    Snapshots.commit(df(1, 2), dir)    // v0
    Snapshots.commitAppend(df(3), dir) // v1: +3
    def deliver(): Unit =
      Snapshots.processNewVersions(spark, dir, cursor, "id", Seq("id", "payload")) {
        (batch, v) => sink(batch, v)
      }
    deliver()

    def landed(): Seq[(Long, String, Long)] =
      spark.read.jdbc(url, target, props)
        .select(col("id"), col("status"), col("version"))
        .as[(Long, String, Long)].collect().toSeq.sorted

    assert(landed() === Seq((1L, "inserted", 0L), (2L, "inserted", 0L),
      (3L, "inserted", 1L)))

    // crash window: v2's changelog reaches the warehouse (staged AND
    // committed by the sink) but the CURSOR write never happens — the
    // documented at-least-once window of processNewVersions
    Snapshots.commit( // v2: 1 deleted, 2 changed, 3 kept
      df(2, 3).withColumn("payload",
        when(col("id") === 2, lit("row-2-CHANGED")).otherwise(col("payload"))), dir)
    var crashed = false
    intercept[RuntimeException] {
      Snapshots.processNewVersions(spark, dir, cursor, "id", Seq("id", "payload")) {
        (batch, v) =>
          sink(batch, v) // lands in Derby, ledger records version 2
          crashed = true
          throw new RuntimeException("driver lost before cursor advance")
      }
    }
    assert(crashed)
    val afterCrash = landed()
    assert(afterCrash === Seq((1L, "deleted", 2L), (1L, "inserted", 0L),
      (2L, "changed", 2L), (2L, "inserted", 0L), (3L, "inserted", 1L)))

    // recovery replays version 2 (cursor never advanced) — the
    // sink's ledger makes the replay a no-op: EXACTLY once end-to-end
    deliver()
    assert(landed() === afterCrash, "replayed version must not duplicate")

    // and the pipeline keeps consuming after recovery
    Snapshots.commitAppend(df(9), dir) // v3
    deliver()
    assert(landed().contains((9L, "inserted", 3L)))
    assert(landed().size === afterCrash.size + 1)
  }
}
