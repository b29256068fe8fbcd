package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K4/Q9: the sorted + partitioned storage layout — the Parquet
  * analog of the reference's ClickHouse MergeTree table
  * (`consumer/clickhouse/init-db.sh:33-36`: `ORDER BY (sensor_id,
  * timestamp)`, commented `PARTITION BY toYYYYMM(timestamp)`).
  *
  * `partitionBy(month)` gives Catalyst partition pruning
  * (`PruneFileSourcePartitions`) for time-range predicates, and
  * `sortWithinPartitions(user_id, ts)` gives parquet row-group
  * min/max stats the same data-skipping power as MergeTree's sparse
  * primary index — a time filter reads only its days, a user
  * filter skips row groups.
  *
  * At 100 TB: day partitions bound file listing; the explicit
  * `repartition(day)` keeps one writer wave per partition value
  * instead of every task writing every day (small-files explosion).
  */
object EventsSink {

  val dayCol = "day"

  /** Write events in the MergeTree-like layout. Expects a `ts`
    * TimestampType column (see [[graft.tables.Tables.eventsNorm]]).
    */
  def write(events: DataFrame, path: String, mode: String = "overwrite"): Unit =
    events
      .withColumn(dayCol, date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col(dayCol))
      // The partition column leads the sort: FileFormatWriter demands
      // rows ordered by partition columns and would otherwise insert
      // its own partition-only sort, destroying the (user_id, ts)
      // order. With the day prefix the required ordering is already
      // satisfied and our full sort survives into the files.
      .sortWithinPartitions(col(dayCol), col("user_id"), col("ts"))
      .write
      .partitionBy(dayCol)
      .mode(mode)
      .parquet(path)

  /** Z-ordered variant: within each day partition, rows sort by the
    * Morton interleave of (user_id, hour-of-day)
    * ([[graft.functions.Layout.zorderKey]]) instead of (user_id, ts).
    * The plain sort gives row-group min/max skipping on its LEADING
    * column only; the Z-order sort clusters every row group into a
    * bounded (user, hour) tile, so min/max stats prune for filters on
    * EITHER dimension — the multi-dimension clustering MergeTree users
    * reach for with a compound ORDER BY, done properly.
    */
  def writeZOrdered(events: DataFrame, path: String, mode: String = "overwrite"): Unit =
    events
      .withColumn(dayCol, date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("_zkey",
        graft.functions.Layout.zorderKey(col("user_id"), hour(col("ts")).cast("long")))
      .repartition(col(dayCol))
      .sortWithinPartitions(col(dayCol), col("_zkey"))
      .drop("_zkey")
      .write
      .partitionBy(dayCol)
      .mode(mode)
      .parquet(path)

  /** Read the layout back; day predicates prune partitions. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
