package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** [[FuzzyJoin]]: the deletion-neighborhood blocking must be EXACT —
  * identical pairs to the all-pairs brute force — that is the whole
  * point of choosing FastSS over probabilistic LSH blocking here.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletion neighborhood contains the string and every single-deletion variant") {
    val row = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s")).as("nb"))
      .head().getSeq[String](0)
    assert(row.toSet === Set("abc", "bc", "ac", "ab"))
  }

  test("joinWithin1 equals the all-pairs brute force on the smoke customers") {
    graft.GraftSession.tune(spark)
    val cust = Tables.customer(spark, sfSmoke).select(col("c_custkey"), col("c_name"))
    // corrupted probes: substitute / delete one digit (mirrors the
    // registered fuzzy_join query's construction)
    val pos = (col("c_custkey") % 9 + 10).cast("int")
    val probes = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("probe_id"),
        concat(col("c_name").substr(lit(1), pos - 1), lit("X"),
          col("c_name").substr(pos + 1, lit(1 << 20))).as("probe"))
      .unionByName(cust.filter(col("c_custkey") % 7 === 3)
        .select(col("c_custkey").as("probe_id"),
          concat(col("c_name").substr(lit(1), pos - 1),
            col("c_name").substr(pos + 1, lit(1 << 20))).as("probe")))

    val fast = FuzzyJoin.joinWithin1(probes, "probe_id", "probe", cust, "c_custkey", "c_name")
      .select("probe_id", "c_custkey", "dist").as[(Long, Long, Long)].collect().toSet

    val brute = probes.crossJoin(cust)
      .withColumn("dist", levenshtein(col("probe"), col("c_name")).cast("long"))
      .filter(col("dist") <= 1)
      .select("probe_id", "c_custkey", "dist").as[(Long, Long, Long)].collect().toSet

    assert(brute.nonEmpty, "fixture must produce matches")
    assert(fast === brute)
  }

  test("a substituted digit in a tens position fans out to multiple customers") {
    graft.GraftSession.tune(spark)
    val cust = Tables.customer(spark, sfSmoke).select(col("c_custkey"), col("c_name"))
    // "Customer#0000000X7" matches Customer#0000000{0..9}7 that exist
    val probe = Seq((7L, "Customer#0000000X7")).toDF("probe_id", "probe")
    val got = FuzzyJoin.joinWithin1(probe, "probe_id", "probe", cust, "c_custkey", "c_name")
      .select("c_custkey").as[Long].collect().toSet
    // only the single-substitution family: Customer#0000000{0..9}7
    // (three-digit keys like 107 differ at TWO positions from the probe)
    val expected = (0 until 10).map(t => t * 10L + 7).toSet
    assert(got === expected)
  }
}
