package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error-bound evidence for the q35 HyperLogLog++ surface: the
  * registered query only exposes a within-3σ boolean (the estimate
  * itself is engine-specific), so this suite pins the actual Spark
  * relative error at the configured rsd and the sketch's merge
  * associativity (partition count must not change the estimate).
  */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct(rsd=0.05) lands within 3 sigma of exact per event_type") {
    val rows = Queries.q35ApproxDistinct(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_bound"),
        s"estimate out of bound for ${r.getAs[String]("event_type")}")
    }
  }

  test("relative error at a known cardinality stays under 3 x rsd") {
    // 100k distinct ids — large enough that HLL leaves sparse mode
    // and the rsd bound is the binding constraint
    val df = spark.range(100000L).select(col("id"))
    val Array(est) = df.agg(approx_count_distinct(col("id"), rsd = 0.05))
      .collect().map(_.getLong(0))
    val err = math.abs(est.toDouble - 100000.0) / 100000.0
    assert(err <= 0.15, s"relative error $err (estimate $est)")
  }

  test("sketch merge is partition-independent (same estimate at 1 and 32 partitions)") {
    val base = spark.range(50000L).select((col("id") % 7919).as("k"))
    def est(parts: Int): Long = base.repartition(parts)
      .agg(approx_count_distinct(col("k"), rsd = 0.05))
      .collect().head.getLong(0)
    assert(est(1) === est(32))
  }

  test("q45: approx percentiles land within the rank bound on every event type") {
    val rows = Queries.q45ApproxQuantiles(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_bound") && r.getAs[Boolean]("p99_within_bound"),
        s"sketch rank out of bound for ${r.getAs[String]("event_type")}")
    }
  }

  test("approx_percentile rank error at accuracy=1000 is far inside the 0.02 gate") {
    // 100k uniform values: the GK guarantee is rank error <= 1/accuracy
    val df = spark.range(100000L).select((col("id") % 9973).cast("double").as("v"))
    val Array(ap) = df.agg(expr("approx_percentile(v, 0.5, 1000)")).collect()
      .map(_.getDouble(0))
    val rank = df.filter(col("v") <= ap).count().toDouble / 100000.0
    assert(math.abs(rank - 0.5) <= 0.005, s"rank $rank for approx p50 $ap")
  }
}
