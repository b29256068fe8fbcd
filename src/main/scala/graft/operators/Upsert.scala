package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped keyed upsert for the [[EventsSink]] layout — the
  * MERGE-INTO analog on plain parquet: replace-or-insert rows keyed
  * by an id column, rewriting ONLY the day partitions the updates
  * touch. At 100 TB this is the difference between a maintenance
  * job that rewrites gigabytes (the affected days) and one that
  * rewrites the table: the anti-join runs against the
  * partition-PRUNED slice of the table, and Spark's dynamic
  * partition overwrite replaces exactly the partitions the merged
  * result writes.
  *
  * Mechanics: updates carry (or derive) the day column; the
  * affected-day list broadcasts into a pruning filter; survivors =
  * existing rows in those days whose key has no update; merged =
  * survivors + updates. The merged slice is localCheckpoint-
  * materialized BEFORE the write because the write overwrites the
  * very files the plan would otherwise still be reading (the
  * classic read-overwrite-same-path trap). Per-partition
  * replacement is atomic per directory on rename-based stores;
  * cross-partition atomicity needs a manifest layer (Delta/Iceberg)
  * — same scope note as [[Compaction]].
  *
  * Keeps the layout contract: rewritten partitions are re-sorted by
  * (user_id, ts) so row-group skipping survives.
  */
object Upsert {

  case class UpsertStats(
      affectedDays: Seq[String], updatedOrInserted: Long, survivors: Long)

  /** @param updates rows to upsert; must carry the table's schema
    *                (day derived from `ts` if absent)
    * @param keyCol  unique row key (e.g. event_id)
    */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
                  keyCol: String): UpsertStats = {
    val dayCol = EventsSink.dayCol
    val up =
      (if (updates.columns.contains(dayCol)) updates
       else updates.withColumn(dayCol, date_format(col("ts"), "yyyy-MM-dd")))
        .withColumn(dayCol, col(dayCol).cast("string"))
    val days = up.select(col(dayCol)).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    require(days.nonEmpty, "no updates to apply")

    // partition inference types `day=` directories as DATE — pin the
    // column back to the writer's string form so the union and the
    // rewritten directory names line up
    val existing = spark.read.parquet(path)
      .withColumn(dayCol, col(dayCol).cast("string"))
      .filter(col(dayCol).isin(days: _*)) // partition-pruned slice
    val survivors = existing.join(
      broadcast(up.select(col(keyCol))), Seq(keyCol), "left_anti")
    val merged = survivors
      .unionByName(up.select(existing.columns.map(col): _*))
      .repartition(col(dayCol))
      .sortWithinPartitions(col(dayCol), col("user_id"), col("ts"))
      // materialize before overwriting the files the plan reads
      .localCheckpoint(eager = true)

    // both counts BEFORE the overwrite: the lazy plans read the very
    // files the write below replaces
    val survivorCount = survivors.count()
    val upCount = up.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      merged.write
        .partitionBy(dayCol)
        .mode("overwrite") // dynamic: only the affected day dirs replaced
        .parquet(path)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    UpsertStats(days, upCount, survivorCount)
  }
}
