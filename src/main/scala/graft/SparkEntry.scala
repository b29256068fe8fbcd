package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IngestPipeline
import graft.queries.Queries
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full ingest DAG
    * (parse → admit → auth semi-join → project+enrich). Driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val d = "/root/testdata/sf0.001"
    IngestPipeline.accepted(
      Tables.eventsNorm(spark, d),
      Tables.activeKeys(spark, d),
      Some(lit(Queries.receivedAtMicros)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate ANN) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
