package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The driver has shipped `events.parquet` with two different `ts`
  * encodings across rounds — TIMESTAMP(NANOS) (read as LongType under
  * `nanosAsLong=true`) and TIMESTAMP(MICROS, ntz) (read as
  * TimestampNTZType). Round 7 lost all 26 events queries when the
  * encoding flipped; this suite pins [[Tables.eventsNorm]] to produce
  * the identical (`ts_ns`, `ts`) contract from BOTH generations.
  */
class EventsNormSpec extends SparkSpec {

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
                          tsType: DataType): Unit = {
    import spark.implicits._
    Seq(
      (1L, -1_500_123_456_789L, 7L, "click", 1.5, """{"k":1}"""),
      (2L, 0L, 8L, "view", 2.5, """{"k":2}"""),
      (3L, 1_721_000_000_123_456_000L, 9L, "click", 3.5, """{"k":3}"""))
      .toDF("event_id", "ns", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.cast(tsType).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def normRows(dir: String): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Tables.eventsNorm(spark, dir)
      .select(col("event_id"), col("ts_ns"), unix_micros(col("ts")))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("eventsNorm: micros-timestamp generation yields exact ts_ns and TimestampType ts") {
    val dir = Files.createTempDirectory("evnorm-us").toString
    // timestamp_micros builds a TimestampType column; cast to NTZ
    // reproduces the round-7 testdata encoding (isAdjustedToUTC=false)
    // floorDiv, not `div`: the fixture must encode the same instant
    // DuckDB would (pre-epoch nanos floor to the earlier microsecond)
    writeEvents(dir, timestamp_micros(expr(
      "(ns div 1000) + (CASE WHEN ns % 1000 < 0 THEN -1 ELSE 0 END)")),
      TimestampNTZType)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"fixture must reproduce the NTZ read path, got ${raw.schema("ts").dataType}")

    val df = Tables.eventsNorm(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_ns").dataType == LongType)
    val rows = normRows(dir)
    // micros precision: expected nanos are the source nanos floored to µs
    def usFloor(ns: Long): Long = Math.floorDiv(ns, 1000L) * 1000L
    assert(rows == Seq(
      (1L, usFloor(-1_500_123_456_789L), usFloor(-1_500_123_456_789L) / 1000),
      (2L, 0L, 0L),
      (3L, 1_721_000_000_123_456_000L, 1_721_000_000_123_456L)))
  }

  test("eventsNorm: nanos-as-long generation floors pre-epoch to DuckDB parity") {
    val dir = Files.createTempDirectory("evnorm-ns").toString
    writeEvents(dir, col("ns"), LongType)
    val df = Tables.eventsNorm(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val rows = normRows(dir)
    // ts_ns is the raw long; ts floors -1_500_123_456_789 ns to
    // -1_500_123_457 µs (floor, not truncate-toward-zero)
    assert(rows == Seq(
      (1L, -1_500_123_456_789L, -1_500_123_457L),
      (2L, 0L, 0L),
      (3L, 1_721_000_000_123_456_000L, 1_721_000_000_123_456L)))
  }

  test("eventsNorm: both generations agree on ts for the driver's actual data") {
    // the live testdata (whatever generation the driver wrote) must
    // load without throwing and expose the contract columns
    val df = Tables.eventsNorm(spark, sfSmoke)
    assert(df.schema("ts_ns").dataType == LongType)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(5).count() > 0)
  }
}
