package graft.operators

import graft.SparkSpec
import graft.tables.Tables

/** Bucketed join co-location: same-key, same-count bucketed tables
  * join with NO shuffle Exchange — asserted on the physical plan.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ customer joins without an Exchange on either side") {
    graft.GraftSession.tune(spark)
    // bucketed joins need the layout respected, not AQE-coalesced away
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sfSmoke).withColumnRenamed("o_custkey", "custkey"),
        "orders_bkt", "custkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.customer(spark, sfSmoke).withColumnRenamed("c_custkey", "custkey"),
        "customer_bkt", "custkey", buckets = 8)

      val joined = Bucketing.coLocatedJoin(spark, "orders_bkt", "customer_bkt", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle either side\n" + plan.take(1200))

      // and it computes the same result as the plain join
      val expected = Tables.orders(spark, sfSmoke)
        .join(Tables.customer(spark, sfSmoke),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
