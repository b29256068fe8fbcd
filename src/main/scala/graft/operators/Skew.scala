package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling (on by
  * default in [[graft.GraftSession]]) covers sort-merge joins at
  * runtime; these cover the cases AQE doesn't: hot-key AGGREGATIONS
  * and hash joins where one key dominates.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: a hot
    * grouping key is split across `saltBuckets` partial groups
    * (phase 1), then the partials merge (phase 2). Counts and sums
    * re-aggregate with sum; min/max with themselves.
    *
    * The salt is derived from a uniqueness column (any
    * high-cardinality column — an id, a timestamp), keeping the
    * plan fully deterministic — no `rand()`.
    *
    * At 100 TB this is the difference between one straggler task
    * holding the hot key's entire partition and `saltBuckets` tasks
    * sharing it.
    */
  def saltedCountSum(df: DataFrame, groupCols: Seq[String],
                     sumCol: String, uniqueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(uniqueCol)), lit(saltBuckets)))
    salted
      .groupBy((groupCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col(sumCol)).as("_sum"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("total"))
  }

  /** Salted broadcast-free join for a skewed fact⋈dim: replicate
    * each dim row `saltBuckets` times (one per salt value) and salt
    * the fact side deterministically, so a hot join key spreads over
    * `saltBuckets` tasks instead of one.
    *
    * Use when the dim is too big to broadcast but small enough to
    * replicate `saltBuckets`×; otherwise prefer `broadcast()` or
    * AQE's skew-join split.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factUniqueCol: String, saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(factUniqueCol)), lit(saltBuckets)))
    val explodedDim = dim.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit(_)): _*)))
    saltedFact.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }
}
