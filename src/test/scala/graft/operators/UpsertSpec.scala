package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** [[Upsert]]: keyed replace-or-insert must change exactly the
  * intended rows, leave every untouched day partition's FILES
  * physically unrewritten (the partition-scoped property that makes
  * the operator affordable at scale), and keep the layout sort.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val p = Files.createTempDirectory("graft-upsert").toString
    graft.GraftSession.tune(spark)
    EventsSink.write(Tables.eventsNorm(spark, sfSmoke), p)
    p
  }

  private def fileSet(path: String): Set[String] =
    Files.walk(java.nio.file.Paths.get(path))
      .filter(_.toString.endsWith(".parquet"))
      .toArray.map(_.toString).toSet

  test("updates replace keyed rows, inserts add, other partitions untouched") {
    val path = freshTable()
    val before = spark.read.parquet(path)
    val cols = before.columns

    // pick two real rows from ONE day to update, plus one brand-new row
    val sample = before.filter(col("day") === "2024-01-15")
      .orderBy(col("event_id")).limit(2).collect()
    assert(sample.length === 2, "fixture day must have rows")
    val day = "2024-01-15"
    val victims = sample.map(_.getAs[Long]("event_id")).toSeq

    val updates = before
      .filter(col("event_id").isin(victims: _*))
      .withColumn("value", lit(99999.5))
      .unionByName(
        before.filter(col("event_id") === victims.head)
          .withColumn("event_id", lit(900000123L))
          .withColumn("value", lit(12345.5)))

    val filesBefore = fileSet(path)
    val beforeCount = before.count() // snapshot: `before` reads doomed files
    val stats = Upsert.upsertByKey(spark, path, updates, "event_id")
    assert(stats.affectedDays === Seq(day))

    val after = spark.read.parquet(path)
    // replaced rows carry the new value
    val vals = after.filter(col("event_id").isin(victims: _*))
      .select($"value").as[Double].collect().toSeq
    assert(vals === Seq(99999.5, 99999.5))
    // the insert landed
    assert(after.filter(col("event_id") === 900000123L).count() === 1)
    // total rows = before + 1 insert
    assert(after.count() === beforeCount + 1)

    // every parquet file OUTSIDE the affected day survives untouched
    val filesAfter = fileSet(path)
    val unaffectedBefore = filesBefore.filterNot(_.contains(s"day=$day"))
    val unaffectedAfter = filesAfter.filterNot(_.contains(s"day=$day"))
    assert(unaffectedBefore === unaffectedAfter,
      "partitions without updates must not be rewritten")
    // and the affected day WAS rewritten
    assert(filesBefore.filter(_.contains(s"day=$day")) !=
      filesAfter.filter(_.contains(s"day=$day")))

    // layout sort survives in the rewritten partition
    val rewritten = filesAfter.filter(_.contains(s"day=$day")).head
    val rows = spark.read.parquet(rewritten)
      .select($"user_id", $"ts".cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    import scala.math.Ordering.Implicits._
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b })
  }

  test("empty updates are refused loudly") {
    val path = freshTable()
    val empty = spark.read.parquet(path).limit(0)
    intercept[IllegalArgumentException] {
      Upsert.upsertByKey(spark, path, empty, "event_id")
    }
  }
}
