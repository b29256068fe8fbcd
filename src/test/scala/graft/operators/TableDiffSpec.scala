package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TableDiff]]: correctness of the three statuses, the identity
  * case, and — the scale property — that a sparse mutation dirties
  * only a sparse set of buckets, so the drill-in join touches a
  * small fraction of the keyspace.
  */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("id", "v", "tag")

  private def base = spark.range(0, 10000)
    .select(col("id"), (col("id") * 3 % 1000).as("v"),
      concat(lit("t"), (col("id") % 5).cast("string")).as("tag"))

  test("identical tables diff to zero rows") {
    assert(TableDiff.diff(base, base, "id", cols).isEmpty)
  }

  test("deleted / inserted / changed keys are all labeled correctly") {
    val other = base.filter(col("id") =!= 17)                       // delete 17
      .withColumn("v", when(col("id") === 42, lit(-1L)).otherwise(col("v"))) // change 42
      .unionByName(Seq((20017L, 1L, "t9")).toDF("id", "v", "tag"))  // insert 20017
    val got = TableDiff.diff(base, other, "id", cols)
      .as[(Long, String)].collect().toMap
    assert(got === Map(17L -> "deleted", 42L -> "changed", 20017L -> "inserted"))
  }

  test("sparse mutations dirty only a sparse bucket set (pruning property)") {
    val b = 1 << 12
    val other = base.withColumn("v",
      when(col("id").isin(5L, 999L, 7777L), lit(-1L)).otherwise(col("v")))
    // count keys surviving the dirty-bucket filter: with 3 mutated
    // keys and 4096 buckets, the drill-in must see ~3/4096 of the
    // keyspace, not all of it — give 10x slack for bucket collisions
    val dirtyKeys = base.select(pmod(xxhash64(col("id")), lit(b)).as("bucket"))
      .join(
        TableDiff.diff(base, other, "id", cols, numBuckets = b)
          .select(pmod(xxhash64(col("id")), lit(b)).as("bucket")).distinct(),
        "bucket")
      .count()
    assert(dirtyKeys <= 10000L * 3 * 10 / b,
      s"drill-in saw $dirtyKeys keys — bucket pruning is not engaging")
  }

  test("NULL-valued cells participate in the checksum (null vs value is a change)") {
    val other = base.withColumn("tag",
      when(col("id") === 100, lit(null: String)).otherwise(col("tag")))
    val got = TableDiff.diff(base, other, "id", cols).as[(Long, String)].collect().toMap
    assert(got === Map(100L -> "changed"))
  }
}
