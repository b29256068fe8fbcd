package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Independent Morton reference: per-bit string interleave. */
  private def morton(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorderKey matches the reference interleave on random keys") {
    val pairs = Gen.listOfN(300, Gen.zip(
      Gen.choose(0L, 1L << 40), Gen.choose(0L, 70000L)))
      .pureApply(Gen.Parameters.default, Seed(11L))
    val got = pairs.toDF("a", "b")
      .select(Layout.zorderKey($"a", $"b").as("z"))
      .as[Long].collect().toSeq
    val want = pairs.map { case (a, b) => morton(a & 0xFFFF, b & 0xFFFF) }
    assert(got === want)
  }

  test("contiguous zkey ranges cover bounded rectangles (locality)") {
    val rows = for (a <- 0L until 256L; b <- 0L until 256L) yield (a, b)
    val stats = rows.toDF("a", "b")
      .select($"a", $"b", Layout.zorderKey($"a", $"b").as("z"))
      .groupBy(org.apache.spark.sql.functions.shiftright($"z", 8).as("bucket"))
      .agg(
        org.apache.spark.sql.functions.max($"a").minus(
          org.apache.spark.sql.functions.min($"a")).as("aw"),
        org.apache.spark.sql.functions.max($"b").minus(
          org.apache.spark.sql.functions.min($"b")).as("bw"))
      .as[(Long, Long, Long)].collect()
    // 2^8-key buckets of a 16-bit interleave are 16x16 tiles
    assert(stats.length === 256)
    stats.foreach { case (_, aw, bw) =>
      assert(aw <= 15 && bw <= 15, s"bucket spans ($aw, $bw), expected <= 15")
    }
  }
}
