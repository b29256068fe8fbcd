package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable partial aggregate states — the Spark-side analog of
  * ClickHouse's AggregatingMergeTree / `-State` + `-Merge`
  * combinators (the pattern the reference's ClickHouse target uses
  * for pre-aggregated rollup tables).
  *
  * A state row holds (count, sum, min, max) for one (key, shard)
  * cell — e.g. one (event_type, day). States are:
  *  - associative/commutative: merging is itself an aggregate, so
  *    Spark's partial aggregation applies to the merge too;
  *  - exact: the sum travels as DECIMAL(18,2), so merge order cannot
  *    change a bit (double summation is not associative — the repo
  *    convention from Queries.scala applies here as well);
  *  - incremental: a new day's states append to the state table and
  *    the next merge reads states only, never raw history.
  *
  * At 100 TB this is the difference between "scan 3 years of raw
  * events per dashboard query" and "scan one state row per
  * (key, day)": the raw scan happens once per shard, ever. The spec
  * (AggStateSpec) round-trips states through parquet and proves
  * late-arriving-shard merge equals a from-scratch aggregate.
  */
object AggState {

  /** Raw rows → one state row per (keys..., shard). `value` must be
    * castable to DECIMAL(18,2).
    */
  def partials(df: DataFrame, keys: Seq[String], shard: Column,
               value: Column): DataFrame =
    df.groupBy((keys.map(col) :+ shard.as("shard")): _*)
      .agg(
        count(value).as("st_n"),
        sum(value.cast("decimal(18,2)")).as("st_sum"),
        min(value).as("st_min"),
        max(value).as("st_max"))

  /** Merge state rows down to `keys` (dropping the shard or any
    * prefix of it). count-of-counts is a sum; min-of-mins / max-of-
    * maxes compose; the DECIMAL sums add exactly. The merged sum
    * keeps Spark's widened DECIMAL(28,2) — casting it back down to
    * (18,2) would, under non-ANSI mode, turn an overflow into a
    * silent NULL and break the documented exactness guarantee
    * (review-caught).
    */
  def merge(states: DataFrame, keys: Seq[String]): DataFrame =
    states.groupBy(keys.map(col): _*)
      .agg(
        sum(col("st_n")).as("n"),
        sum(col("st_sum")).as("sum_value"),
        min(col("st_min")).as("min_value"),
        max(col("st_max")).as("max_value"))
}
