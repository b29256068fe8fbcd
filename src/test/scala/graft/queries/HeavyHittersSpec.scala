package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{MgState, MisraGriesTopK}

import graft.SparkSpec

/** Adversarial evidence for the q47 Misra-Gries surface: the
  * registered query only exposes found/within-bound booleans for the
  * guaranteed-heavy keys, so this suite pins the actual deterministic
  * guarantee — `est <= true <= est + n/(m+1)` for every tracked key
  * and presence of every key above the threshold — on random skewed
  * streams, under repartitioning (merge path), and at the exactness
  * boundary (m >= distinct keys => no error at all).
  */
class HeavyHittersSpec extends SparkSpec {

  private val m = 16

  /** Zipf-ish random stream with a known exact histogram. */
  private def stream(seed: Int, n: Int, keys: Int): Seq[Long] = {
    val rnd = new Random(seed)
    // square the uniform draw to skew low keys heavy
    Seq.fill(n) {
      val u = rnd.nextDouble()
      (u * u * keys).toLong
    }
  }

  private def sketchOf(xs: Seq[Long], parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val rows = xs.toDF("k").repartition(parts)
      .agg(MisraGriesTopK(col("k"), m).as("sk"))
      .selectExpr("inline(sk)")
      .collect()
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def checkGuarantee(xs: Seq[Long], parts: Int): Unit = {
    val truth = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bound = xs.size.toDouble / (m + 1)
    val est = sketchOf(xs, parts)
    est.foreach { case (k, e) =>
      val t = truth.getOrElse(k, 0L)
      assert(e <= t, s"overestimate for $k: est $e > true $t")
      assert(t - e <= bound, s"deficit for $k: true $t - est $e > $bound")
    }
    truth.filter(_._2 > bound).foreach { case (k, t) =>
      assert(est.contains(k), s"guaranteed-heavy key $k (count $t) missing")
    }
  }

  test("deterministic error bound holds on random skewed streams") {
    for (seed <- 1 to 3) checkGuarantee(stream(seed, 20000, 400), parts = 8)
  }

  test("guarantee survives repartitioning (merge path, 1 vs 32 partitions)") {
    val xs = stream(7, 30000, 500)
    checkGuarantee(xs, parts = 1)
    checkGuarantee(xs, parts = 32)
  }

  test("exact when capacity covers every distinct key") {
    import spark.implicits._
    val xs = stream(11, 5000, m / 2) // distinct keys < m
    val truth = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = sketchOf(xs, parts = 8)
    assert(est === truth)
  }

  test("classic eviction trace: decrement-all retires m+1 units") {
    val st = new MgState(2)
    Seq(1L, 1L, 1L, 2L, 3L).foreach(st.addOne)
    // 3 arrives at capacity: {1:3, 2:1} decrements to {1:2}, 3 discarded
    assert(st.sortedEntries.toSeq === Seq((1L, 2L)))
    st.addOne(4L)
    assert(st.sortedEntries.toSeq === Seq((1L, 2L), (4L, 1L)))
  }

  test("merge compress subtracts the (m+1)-th largest count") {
    val a = new MgState(2)
    Seq(1L, 1L, 1L, 2L, 2L).foreach(a.addOne)  // {1:3, 2:2}
    val b = new MgState(2)
    Seq(3L, 3L, 3L, 3L, 2L).foreach(b.addOne)  // {3:4, 2:1}
    a.mergeWith(b)                              // union {1:3, 2:3, 3:4}, cut = 3
    assert(a.sortedEntries.toSeq === Seq((3L, 1L)))
  }

  test("q47 booleans are all true end-to-end (sketch honours the theorem)") {
    val rows = Queries.q47HeavyHitters(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    // the two planted hot users must clear the threshold
    val ids = rows.map(_.getAs[Long]("user_id")).toSet
    assert(ids.contains(-1L) && ids.contains(-2L))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("found_in_sketch"),
        s"user ${r.getAs[Long]("user_id")} not found in sketch")
      assert(r.getAs[Boolean]("estimate_ok"),
        s"user ${r.getAs[Long]("user_id")} estimate out of bound")
    }
  }
}
