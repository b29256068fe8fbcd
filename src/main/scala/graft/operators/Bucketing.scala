package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) table layout for shuffle-free joins —
  * the write-time co-location strategy for fact⋈fact joins that are
  * too big to broadcast and run repeatedly on the same key.
  *
  * `bucketBy(n, key)` hash-partitions rows into n buckets per key at
  * WRITE time and records the layout in the catalog; a join between
  * two tables bucketed on the join key with the same bucket count
  * needs NO Exchange on either side — at 100 TB that deletes the
  * single most expensive stage of a repeated star join.
  */
object Bucketing {

  /** Write a table bucketed (and sorted) by `key` into the catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 16): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key. The caller
    * asserts plan shape (no Exchange) in tests; Spark picks
    * sort-merge over the pre-bucketed layout automatically.
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
