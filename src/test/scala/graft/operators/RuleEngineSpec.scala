package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** [[RuleEngine]]: every operator of the rule grammar, SQL
  * three-valued NULL logic, loud failure on malformed policies, and
  * the scale property — compiled rules reach the parquet scan as
  * PushedFilters like hand-written predicates.
  */
class RuleEngineSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "en", 100L, "alpha data beta"),
    (2L, "de", 250L, "plain"),
    (3L, null.asInstanceOf[String], 300L, "data"),
    (4L, "fr", 50L, null.asInstanceOf[String])
  ).toDF("id", "lang", "n", "text")

  private def ids(rule: String): Set[Long] =
    rows.filter(RuleEngine.compile(rule)).select("id").as[Long].collect().toSet

  test("comparison, membership, string and null operators") {
    assert(ids("""{"gte": ["n", 250]}""") === Set(2L, 3L))
    assert(ids("""{"ne": ["lang", "en"]}""") === Set(2L, 4L)) // NULL lang filtered
    assert(ids("""{"in": ["lang", ["en", "fr"]]}""") === Set(1L, 4L))
    assert(ids("""{"contains": ["text", "data"]}""") === Set(1L, 3L))
    assert(ids("""{"matches": ["text", "^data$"]}""") === Set(3L))
    assert(ids("""{"null": "lang"}""") === Set(3L))
    assert(ids("""{"notnull": "text"}""") === Set(1L, 2L, 3L))
  }

  test("boolean composition with three-valued NULL semantics") {
    // NOT(lang = 'en') over NULL lang is NULL, not true — row 3 stays out
    assert(ids("""{"not": {"eq": ["lang", "en"]}}""") === Set(2L, 4L))
    assert(ids("""{"and": [{"gte": ["n", 100]}, {"contains": ["text", "data"]}]}""")
      === Set(1L, 3L))
    assert(ids("""{"or": [{"lt": ["n", 60]}, {"eq": ["lang", "de"]}]}""")
      === Set(2L, 4L))
  }

  test("malformed policies fail loudly at compile time") {
    intercept[IllegalArgumentException](RuleEngine.compile("""{"between": ["n", 1, 2]}"""))
    intercept[IllegalArgumentException](RuleEngine.compile("""{"and": []}"""))
    intercept[IllegalArgumentException](RuleEngine.compile("""{"eq": ["n"]}"""))
    intercept[IllegalArgumentException](RuleEngine.compile("""42"""))
  }

  test("compiled rules push down to the parquet scan") {
    graft.GraftSession.tune(spark)
    val plan = Tables.documents(spark, sfSmoke)
      .filter(RuleEngine.compile("""{"and": [{"gte": ["n_chars", 150]}, {"eq": ["lang", "en"]}]}"""))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(400))
    assert(plan.contains("GreaterThanOrEqual(n_chars,150)"), plan.take(2000))
    assert(plan.contains("EqualTo(lang,en)"), plan.take(2000))
  }
}
