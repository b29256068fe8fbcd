package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** [[AggState]]: states must be exact, mergeable in any grouping, and
  * — the operating-model property — incrementally maintainable: a
  * late-arriving shard appends its states to the persisted state
  * table and the next merge equals a from-scratch aggregate over all
  * raw data, without ever rescanning history.
  */
class AggStateSpec extends SparkSpec {

  private def events = {
    graft.GraftSession.tune(spark)
    Tables.eventsNorm(spark, sfSmoke)
  }
  private val day = expr(Tables.tsNsFloorDiv(86400L * 1000L * 1000L * 1000L))

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(col("event_type"), col("n"),
        col("sum_value").cast("string").as("s"), col("min_value"), col("max_value"))
      .collect().map(_.toString).toSet

  test("merge of per-day states equals the direct aggregate") {
    val direct = events.groupBy(col("event_type"))
      .agg(count(col("value")).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    val viaStates = AggState.merge(
      AggState.partials(events, Seq("event_type"), day, col("value")),
      Seq("event_type"))
    assert(canon(viaStates) === canon(direct))
  }

  test("late shard appends to the parquet state table; merge never rescans history") {
    val stateDir = Files.createTempDirectory("graft-aggstate").toString
    val cut = events.select(max(day).as("m")).head().getLong(0)

    // day 1..n-1 states persisted "historically"
    AggState.partials(events.filter(day < cut), Seq("event_type"), day, col("value"))
      .write.mode("overwrite").parquet(stateDir)
    // the late shard arrives: append ONLY its states
    AggState.partials(events.filter(day === cut), Seq("event_type"), day, col("value"))
      .write.mode("append").parquet(stateDir)

    val merged = AggState.merge(spark.read.parquet(stateDir), Seq("event_type"))
    val direct = events.groupBy(col("event_type"))
      .agg(count(col("value")).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    assert(canon(merged) === canon(direct))
  }

  test("states merge associatively: (typexday -> typexweek -> type) == (typexday -> type)") {
    val daily = AggState.partials(events, Seq("event_type"), day, col("value"))
    // roll daily STATES up to weekly STATES (state-on-state merge;
    // days are positive here so floor(day/7) is the week shard),
    // then collapse — must equal the one-step collapse
    val weekly = daily
      .groupBy(col("event_type"), floor(col("shard") / 7).as("shard"))
      .agg(sum(col("st_n")).as("st_n"),
        sum(col("st_sum")).cast("decimal(18,2)").as("st_sum"),
        min(col("st_min")).as("st_min"), max(col("st_max")).as("st_max"))
    assert(canon(AggState.merge(weekly, Seq("event_type")))
      === canon(AggState.merge(daily, Seq("event_type"))))
  }
}
