package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WindowFunnel

import graft.SparkSpec

/** Chain-search evidence for the q48 funnel aggregate: the registered
  * query's oracle re-derives every per-start greedy chain in SQL, so
  * this suite pins the semantics the oracle can't isolate — the
  * later-start-beats-earliest case (why eval tries every start),
  * strict timestamp increase, the inclusive window edge, merge-order
  * insensitivity — plus a brute-force equivalence sweep on random
  * event sets.
  */
class WindowFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def depth(events: Seq[(Long, Int)], nSteps: Int, window: Long,
                    parts: Int = 4): Int =
    events.toDF("ts", "step")
      .withColumn("step", col("step").cast("int"))
      .repartition(parts)
      .agg(WindowFunnel(col("ts"), col("step"), nSteps, window).as("d"))
      .collect().head.getInt(0)

  /** Exhaustive reference: longest strictly-increasing step-1..k
    * chain within `window` of its first event.
    */
  private def brute(events: Seq[(Long, Int)], nSteps: Int, window: Long): Int = {
    def extend(prev: Long, limit: Long, k: Int): Int =
      if (k > nSteps) k - 1
      else {
        val nexts = events.filter(e => e._2 == k && e._1 > prev && e._1 <= limit)
        if (nexts.isEmpty) k - 1
        else nexts.map(t => extend(t._1, limit, k + 1)).max
      }
    val starts = events.filter(_._2 == 1)
    if (starts.isEmpty) 0
    else starts.map(s => extend(s._1, s._1 + window, 2).max(1)).max
  }

  test("a later start can out-chain the earliest start (per-start search)") {
    // earliest view's window misses the click; the later view chains fully
    val ev = Seq((0L, 1), (100L, 1), (101L, 2), (102L, 3))
    assert(depth(ev, 3, window = 10L) === 3)
  }

  test("timestamps must strictly increase (equal ts does not chain)") {
    assert(depth(Seq((5L, 1), (5L, 2)), 2, window = 10L) === 1)
  }

  test("window edge is inclusive at start + window") {
    assert(depth(Seq((0L, 1), (10L, 2)), 2, window = 10L) === 2)
    assert(depth(Seq((0L, 1), (11L, 2)), 2, window = 10L) === 1)
  }

  test("greedy earliest-next within a fixed start is what chains deepest") {
    // taking click@9 would strand the purchase@5; earliest click@2 chains
    assert(depth(Seq((0L, 1), (2L, 2), (9L, 2), (5L, 3)), 3, window = 10L) === 3)
  }

  test("no step-1 event means depth 0; steps outside 1..n are ignored") {
    assert(depth(Seq((1L, 2), (2L, 3)), 3, window = 10L) === 0)
    assert(depth(Seq((1L, 1), (2L, 9), (3L, 0)), 3, window = 10L) === 1)
  }

  test("matches the exhaustive reference on random event sets") {
    val rnd = new Random(42)
    for (trial <- 1 to 40) {
      val n = 3 + rnd.nextInt(18)
      val ev = Seq.fill(n)((rnd.nextInt(40).toLong, 1 + rnd.nextInt(3)))
      val w = (5 + rnd.nextInt(30)).toLong
      assert(depth(ev, 3, w) === brute(ev, 3, w),
        s"trial $trial diverged on $ev window $w")
    }
  }

  test("merge-order insensitive: identical depth at 1 and 8 partitions") {
    val rnd = new Random(7)
    val ev = Seq.fill(200)((rnd.nextInt(1000).toLong, 1 + rnd.nextInt(3)))
    assert(depth(ev, 3, 50L, parts = 1) === depth(ev, 3, 50L, parts = 8))
  }
}
