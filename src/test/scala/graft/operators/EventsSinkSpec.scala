package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** K4/Q9: MergeTree-analog layout — day partition pruning and
  * within-partition sort (mirrors `init-db.sh:33-36`).
  */
class EventsSinkSpec extends SparkSpec {

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft-sink").toString
    graft.GraftSession.tune(spark)
    EventsSink.write(Tables.eventsNorm(spark, sfSmoke), p)
    p
  }

  test("roundtrip preserves every row") {
    val n = Tables.eventsNorm(spark, sfSmoke).count()
    assert(EventsSink.read(spark, path).count() === n)
  }

  test("a day predicate prunes partitions in the physical plan") {
    val filtered = EventsSink.read(spark, path).filter(col("day") === "2024-01-15")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(plan.contains("day"), plan.take(500))
    // and the pruned scan reads strictly fewer files than exist
    val allParts = Files.list(java.nio.file.Paths.get(path))
      .filter(_.getFileName.toString.startsWith("day="))
      .count()
    assert(allParts > 1, s"testdata spans $allParts days; pruning test needs > 1")
    val expected = Tables.eventsNorm(spark, sfSmoke)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-15").count()
    assert(filtered.count() === expected)
  }

  test("rows are sorted by (user_id, ts) within each file (row-group skipping layout)") {
    import spark.implicits._
    val files = Files.walk(java.nio.file.Paths.get(path))
      .filter(_.toString.endsWith(".parquet")).toArray.map(_.toString)
    assert(files.nonEmpty)
    val rows = spark.read.parquet(files.head)
      .select($"user_id", $"ts".cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    import scala.math.Ordering.Implicits._
    val sorted = rows.zip(rows.tail).forall { case (a, b) => a <= b }
    assert(sorted, s"file ${files.head} is not sorted by (user_id, ts)")
  }

  test("z-ordered layout clusters files into bounded (user, hour) tiles on both dimensions") {
    import spark.implicits._
    val zpath = Files.createTempDirectory("graft-zsink").toString
    EventsSink.writeZOrdered(Tables.eventsNorm(spark, sfSmoke), zpath)
    assert(EventsSink.read(spark, zpath).count() ===
      Tables.eventsNorm(spark, sfSmoke).count())
    val files = Files.walk(java.nio.file.Paths.get(zpath))
      .filter(_.toString.endsWith(".parquet")).toArray.map(_.toString)
    assert(files.nonEmpty)
    // within a file, consecutive Morton keys must be non-decreasing —
    // the property that turns row-group min/max stats into 2-D tiles
    val zrows = spark.read.parquet(files.head)
      .select($"user_id", hour($"ts").cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def morton(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val keys = zrows.map { case (u, h) => morton(u & 0xFFFF, h & 0xFFFF) }
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
      s"file ${files.head} is not in Morton order")
  }
}
