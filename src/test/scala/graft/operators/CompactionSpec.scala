package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** [[Compaction]]: small-file rewrite of the EventsSink layout must
  * shrink the file count, preserve the row multiset bit-for-bit,
  * keep the (user_id, ts) within-file sort and day partition
  * pruning, and refuse to touch the original until the rewrite
  * verifies.
  */
class CompactionSpec extends SparkSpec {

  /** A deliberately fragmented table: tiny maxRecordsPerFile at
    * write time simulates a per-micro-batch streaming ingest.
    */
  private def fragmented(): String = {
    val p = Files.createTempDirectory("graft-compact").toString
    graft.GraftSession.tune(spark)
    Tables.eventsNorm(spark, sfSmoke)
      .withColumn(EventsSink.dayCol, date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(8)
      .sortWithinPartitions(col(EventsSink.dayCol), col("user_id"), col("ts"))
      .write.partitionBy(EventsSink.dayCol)
      .option("maxRecordsPerFile", 7)
      .mode("overwrite").parquet(p)
    p
  }

  test("compaction shrinks files, preserves rows, keeps sort and pruning") {
    import spark.implicits._
    val path = fragmented()
    val beforeRows = spark.read.parquet(path)
      .select($"event_id").as[Long].collect().sorted.toSeq
    val before = Compaction.audit(spark, path)
    assert(before.files > 50, s"fixture should fragment, got ${before.files}")

    val stats = Compaction.compact(spark, path, targetRecordsPerFile = 1000000)
    assert(stats.beforeFiles === before.files)
    assert(stats.afterFiles < before.files / 5,
      s"expected real consolidation, got ${stats.afterFiles}")
    assert(stats.rows === beforeRows.size.toLong)

    // row multiset preserved
    val afterRows = spark.read.parquet(path)
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(afterRows === beforeRows)

    // (user_id, ts) sort survives into the rewritten files
    val files = Files.walk(java.nio.file.Paths.get(path))
      .filter(_.toString.endsWith(".parquet")).toArray.map(_.toString)
    val rows = spark.read.parquet(files.head)
      .select($"user_id", $"ts".cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    import scala.math.Ordering.Implicits._
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b },
      s"file ${files.head} lost the (user_id, ts) sort")

    // day partition pruning still works on the rewritten table
    val plan = spark.read.parquet(path)
      .filter(col(EventsSink.dayCol) === "2024-01-15")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      plan.take(500))
  }

  test("audit reports zero for a missing path; compact validates its knob") {
    assert(Compaction.audit(spark, "/nonexistent/graft/path").files === 0)
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, "/tmp/whatever", targetRecordsPerFile = 0)
    }
  }
}
