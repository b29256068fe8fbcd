package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source/sink format coverage beyond parquet: the reference's wire
  * format is JSON lines, and CSV is the interchange lowest common
  * denominator — both read with EXPLICIT schemas (streaming-safe; no
  * inference jobs at scale). Plus columnar-codec choice (zstd) on the
  * parquet path.
  */
class FileFormatsSpec extends SparkSpec {

  private def events = {
    graft.GraftSession.tune(spark)
    Tables.eventsNorm(spark, sfSmoke)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String, Double)] = {
    import spark.implicits._
    df.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq
  }

  test("events round-trip through JSON lines with an explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    events.write.json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(canon(back) === canon(events))
  }

  test("events round-trip through CSV with header and explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    events.write.option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(canon(back) === canon(events))
  }

  test("zstd-compressed parquet round-trips and stays smaller than json") {
    val base = Files.createTempDirectory("graft-zstd").toString
    events.write.option("compression", "zstd").parquet(s"$base/pq")
    events.write.json(s"$base/js")
    val back = spark.read.parquet(s"$base/pq")
    assert(canon(back) === canon(events))
    def bytes(p: String): Long =
      Files.walk(java.nio.file.Paths.get(p)).filter(Files.isRegularFile(_))
        .mapToLong(Files.size(_)).sum()
    assert(bytes(s"$base/pq") < bytes(s"$base/js"),
      "columnar+zstd must beat row-wise json on size")
  }

  test("nanos→micros conversion FLOORS like DuckDB epoch_us, including pre-epoch") {
    import spark.implicits._
    val cases = Seq(-2000L, -1500L, -1L, 0L, 1L, 999L, 1000L, 1500L,
      Long.MaxValue / 2, -1234567891L)
    val got = cases.toDF("ts_ns")
      .select(expr(Tables.tsUsExpr).as("us")).as[Long].collect().toSeq
    val expected = cases.map(n => Math.floorDiv(n, 1000L))
    assert(got === expected)
  }
}
