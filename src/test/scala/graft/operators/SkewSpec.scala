package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key "hot"
  private lazy val skewed = (1L to 1000L).map { i =>
    (if (i <= 900) "hot" else s"k${i % 7}", i, i.toDouble)
  }.toDF("key", "id", "v")

  test("saltedCountSum equals the direct aggregation") {
    val direct = skewed.groupBy($"key")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum($"v").as("total"))
      .as[(String, Long, Double)].collect()
      .map { case (k, c, t) => k -> ((c, t)) }.toMap
    val saltedRes = Skew.saltedCountSum(skewed, Seq("key"), "v", "id")
      .as[(String, Long, Double)].collect()
      .map { case (k, c, t) => k -> ((c, t)) }.toMap
    assert(saltedRes === direct)
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"),
      ("k4", "D"), ("k5", "E"), ("k6", "F"), ("k0", "G")).toDF("key", "label")
    val plain = skewed.join(dim, "key")
      .select("id", "label").as[(Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "key", "id")
      .select("id", "label").as[(Long, String)].collect().sorted.toSeq
    assert(salted === plain)
  }
}
