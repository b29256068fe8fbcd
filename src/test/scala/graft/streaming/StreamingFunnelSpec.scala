package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WindowFunnel

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

case class SFEvent(u: Long, t: Long, s: Int)

/** Streaming funnel ([[StreamingFunnel]]): prefix equivalence with
  * the batch `window_funnel` aggregate under arbitrary delivery
  * chunking, the completed-user state drop, and monotone depth across
  * triggers.
  */
class StreamingFunnelSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  // keyed state on RocksDB — the at-scale provider (matches the
  // other stateful suites); restored after the suite
  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private var prevProvider: Option[String] = None
  override def beforeAll(): Unit = {
    prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    prevProvider match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
    super.afterAll()
  }

  private val window = 50L
  private val nSteps = 3

  private def run(chunks: Seq[Seq[SFEvent]]):
      Seq[StreamingFunnel.UserFunnel] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SFEvent]
    val sink = s"sfun_${System.nanoTime()}"
    val q = StreamingFunnel.depths(ms.toDF(), col("u"), col("t"), col("s"),
        nSteps, window)
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    spark.table(sink).as[StreamingFunnel.UserFunnel].collect().toSeq
  }

  private def batchDepths(events: Seq[SFEvent]): Map[Long, Int] =
    events.toDF("u", "t", "s")
      .withColumn("s", col("s").cast("int"))
      .groupBy(col("u"))
      .agg(WindowFunnel(col("t"), col("s"), nSteps, window).as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("final streamed depth equals the batch aggregate, any chunking") {
    val rnd = new Random(3)
    val events = Seq.fill(600)(
      SFEvent(rnd.nextInt(20).toLong, rnd.nextInt(300).toLong, 1 + rnd.nextInt(3)))
    for (chunkSize <- Seq(600, 100, 7)) {
      val all = run(events.grouped(chunkSize).toSeq)
      val fin = all.groupBy(_.user_id).map { case (u, v) =>
        u -> v.map(_.depth).max }
      assert(fin === batchDepths(events), s"chunk size $chunkSize diverged")
    }
  }

  test("completed users drop their event buffer and stay at full depth") {
    val c1 = Seq(SFEvent(1, 10, 1), SFEvent(1, 11, 2), SFEvent(1, 12, 3))
    val c2 = Seq(SFEvent(1, 20, 1), SFEvent(1, 21, 1))
    val all = run(Seq(c1, c2))
    val mine = all.filter(_.user_id == 1L)
    assert(mine.forall(_.depth == nSteps))
    assert(mine.forall(_.buffered_events == 0),
      "completed funnel must not retain or grow state")
  }

  test("depth is monotone non-decreasing across triggers") {
    val chunks = Seq(
      Seq(SFEvent(5, 10, 1)),
      Seq(SFEvent(5, 15, 2)),
      Seq(SFEvent(5, 20, 3)))
    // 1 event -> depth 1, 2 -> 2, completion -> 3 (buffer dropped to 0)
    assert(run(chunks).filter(_.user_id == 5L).map(_.depth).sorted ===
      Seq(1, 2, 3))
  }

  // ---- watermark-bounded variant ([[StreamingFunnel.depthsWatermarked]]) ----

  /** Drive the watermarked twin chunk-by-chunk (t is epoch seconds —
    * the operator casts bigint→timestamp; windowMs/horizonMs are the
    * millisecond twins of the batch test's second-unit window, so the
    * chain semantics are identical under the ×1000 rescale). Yields
    * ALL sink rows so far after each chunk. */
  private def runWatermarked(chunks: Seq[Seq[SFEvent]], delay: String,
                             windowMs: Long, horizonMs: Long,
                             advanceOnAll: Boolean = false)(
      check: (Int, Seq[StreamingFunnel.UserFunnel]) => Unit): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SFEvent]
    val sink = s"sfunw_${System.nanoTime()}"
    val q = StreamingFunnel.depthsWatermarked(ms.toDF(), col("u"), col("t"),
        col("s"), nSteps, windowMs, watermarkDelay = delay,
        horizonMs = horizonMs, advanceOnAllEvents = advanceOnAll)
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .start()
    try chunks.zipWithIndex.foreach { case (ch, i) =>
      ms.addData(ch)
      q.processAllAvailable()
      check(i,
        spark.table(sink).as[StreamingFunnel.UserFunnel].collect().toSeq)
    } finally q.stop()
  }

  test("watermarked twin equals the batch aggregate after every prefix while nothing is late") {
    val rnd = new Random(11)
    // t >= 1: the initial watermark is 0 ms and the late filter drops
    // ts <= watermark, so an epoch-0 event is late by definition
    val events = Seq.fill(600)(
      SFEvent(rnd.nextInt(20).toLong, rnd.nextInt(300).toLong + 1,
        1 + rnd.nextInt(3)))
    // delay far beyond the ts range: nothing late; horizon far beyond:
    // no fold ever fires — must reduce exactly to the unbounded twin
    val chunks = events.grouped(45).toSeq
    var delivered = Seq.empty[SFEvent]
    runWatermarked(chunks, delay = "100000 seconds",
      windowMs = window * 1000, horizonMs = 1000000000L) { (i, rows) =>
        delivered = delivered ++ chunks(i)
        val fin = rows.groupBy(_.user_id).map { case (u, v) =>
          u -> v.map(_.depth).max }
        assert(fin === batchDepths(delivered), s"diverged after chunk $i")
    }
  }

  test("fold+prune keeps the achieved depth, restarts the buffer, and still completes") {
    // window 50 s, horizon 100 s, delay 0 s
    val chunks = Seq(
      Seq(SFEvent(1, 10, 1), SFEvent(1, 20, 2)), // A: depth 2, buffer 2
      Seq(SFEvent(2, 200, 1)),                   // wm -> 200 s after batch
      Seq(SFEvent(1, 201, 1)),  // A's old events are beyond window+horizon
                                // reach: folded (via prune or timeout) —
                                // depth stays 2, buffer restarts at 1
      Seq(SFEvent(1, 202, 2), SFEvent(1, 203, 3))) // fresh chain completes
    runWatermarked(chunks, delay = "0 seconds",
      windowMs = 50000L, horizonMs = 100000L) { (i, rows) =>
        val a = rows.filter(_.user_id == 1L)
        if (i == 2) {
          assert(a.exists(r => r.depth == 2 && r.buffered_events == 1),
            s"fold must keep depth 2 with a restarted 1-event buffer: $a")
          assert(!a.exists(_.buffered_events == 3),
            s"old events survived the fold (no prune happened): $a")
        }
        if (i == 3) {
          assert(a.exists(r => r.depth == 3 && r.buffered_events == 0),
            s"fresh chain must still complete after the fold: $a")
        }
    }
  }

  test("advanceOnAllEvents: non-funnel rows drive eviction but never create state") {
    // window 50 s, horizon 50 s, delay 0. User 9's events carry step 0
    // (a non-funnel type after the NULL→0 coalesce): in this mode they
    // must advance the watermark — firing A's fold — while user 9
    // itself gets no output row (an invalid-only group never updates
    // state; rows-law proven at scale in BENCH_STRESS_STREAM).
    val chunks = Seq(
      Seq(SFEvent(1, 10, 1), SFEvent(1, 20, 2)), // A: depth 2, timeout 70 s
      Seq(SFEvent(9, 200, 0)),                   // wm -> 200 s after batch
      Seq(SFEvent(9, 201, 0)))                   // a batch with wm past 70 s
    runWatermarked(chunks, delay = "0 seconds", windowMs = 50000L,
      horizonMs = 50000L, advanceOnAll = true) { (i, rows) =>
        if (i == 2) {
          val a = rows.filter(_.user_id == 1L)
          assert(a.exists(r => r.depth == 2 && r.buffered_events == 0),
            s"the non-funnel traffic must have fired A's fold: $a")
          assert(!rows.exists(_.user_id == 9L),
            s"invalid-only group emitted a row: $rows")
        }
    }
  }

  test("lossless under random chunking WITH late drops and mid-stream folds") {
    // The strongest form of the fold/prune claim: with a short window
    // and horizon, folds, prunes, and settles all happen MID-STREAM,
    // late rows are really dropped, and invalid steps (advanceOnAll
    // mode) advance the watermark — yet every user's final depth must
    // equal the batch aggregate over exactly the kept events. The
    // engine's late rule is simulated chunk by chunk: with delay 0 the
    // watermark before chunk k is the max event time of chunks < k,
    // and a row is kept iff its time is strictly above it.
    val rnd = new Random(19)
    val events = Seq.fill(300)(SFEvent(
      rnd.nextInt(10).toLong, rnd.nextInt(500).toLong + 1,
      rnd.nextInt(5))) // steps 0..4: only 1..3 are funnel steps
    val chunks = events.grouped(30).toSeq
    var wm = 0L // engine watermark in ms; t is epoch seconds
    val kept = scala.collection.mutable.Buffer[SFEvent]()
    chunks.foreach { ch =>
      ch.foreach(e => if (e.t * 1000 > wm) kept += e)
      wm = math.max(wm, ch.map(_.t).max * 1000)
    }
    // non-vacuous: the scenario must actually drop rows as late
    assert(kept.nonEmpty && kept.size < events.size,
      s"fixture produced no late rows (kept ${kept.size}/${events.size})")
    // batch ground truth over the kept VALID events (users with no
    // valid kept event emit nothing in streaming and must be absent)
    val expected = batchDepths(kept.toSeq.filter(e => e.s >= 1 && e.s <= 3))
    val all = scala.collection.mutable.Buffer[StreamingFunnel.UserFunnel]()
    runWatermarked(chunks, delay = "0 seconds",
      windowMs = 50000L, horizonMs = 60000L, advanceOnAll = true) {
      (i, rows) => if (i == chunks.length - 1) all ++= rows
    }
    val fin = all.groupBy(_.user_id).map { case (u, v) =>
      u -> v.map(_.depth).max }
    assert(fin === expected,
      "folded/pruned/settled state diverged from the batch aggregate over kept events")
  }

  test("an invalid-only batch must not cancel the pending fold (review r13)") {
    // Spark writes keyed state back with NO_TIMESTAMP on any function
    // invocation that does not re-set a timeout — before the r13 fix,
    // a batch carrying only non-funnel rows for a buffered user
    // silently cancelled their fold horizon, so the buffer never
    // settled to the scalar. Window 50 s, horizon 50 s, delay 0.
    val chunks = Seq(
      Seq(SFEvent(1, 10, 1), SFEvent(1, 20, 2)), // A buffers 2; timeout 70 s
      Seq(SFEvent(1, 30, 0)),  // invalid step FOR A: the bug trigger —
                               // the invocation must re-arm A's timeout
      Seq(SFEvent(2, 200, 1)), // wm -> 200 s after batch (past 70 s)
      Seq(SFEvent(2, 201, 0))) // a batch in which A's timeout can fire
    runWatermarked(chunks, delay = "0 seconds", windowMs = 50000L,
      horizonMs = 50000L, advanceOnAll = true) { (i, rows) =>
        val a = rows.filter(_.user_id == 1L)
        if (i == 1) assert(a.size === 1,
          s"an invalid-only batch must emit nothing for A: $a")
        if (i == 3) assert(a.exists(r => r.depth == 2 && r.buffered_events == 0),
          s"A's fold never fired — the invalid-only batch cancelled the timeout: $a")
    }
  }

  test("a converted user's row is emitted exactly once (no re-emission on later batches)") {
    // Update-mode consumers that COUNT conversion rows must see one
    // row per conversion (advisor r13): after user 1 completes in
    // chunk 0, further valid events for them must emit nothing.
    val chunks = Seq(
      Seq(SFEvent(1, 10, 1), SFEvent(1, 11, 2), SFEvent(1, 12, 3)),
      Seq(SFEvent(1, 20, 1)),
      Seq(SFEvent(1, 21, 2), SFEvent(2, 30, 1)))
    runWatermarked(chunks, delay = "100000 seconds",
      windowMs = 50000L, horizonMs = 1000000000L) { (i, rows) =>
        val a = rows.filter(_.user_id == 1L)
        assert(a.size === 1 && a.head.depth === nSteps,
          s"chunk $i: expected exactly the single conversion row, got $a")
    }
  }

  test("an event older than the watermark is dropped, exactly like a batch time bound") {
    // delay 0 s, huge horizon (no fold interference):
    //   chunk0: A s1@10 -> depth 1; chunk1: B@100 pushes wm to 100 s;
    //   chunk2: A s2@20 — LATE (20 <= wm): would have made depth 2 if
    //           leaked (within window 50 of s1@10); must change nothing
    //   chunk3: A s2@101 — in-order but outside s1's window: depth 1
    val chunks = Seq(
      Seq(SFEvent(1, 10, 1)),
      Seq(SFEvent(2, 100, 1)),
      Seq(SFEvent(1, 20, 2)),
      Seq(SFEvent(1, 101, 2)))
    runWatermarked(chunks, delay = "0 seconds",
      windowMs = 50000L, horizonMs = 100000000L) { (i, rows) =>
        val a = rows.filter(_.user_id == 1L)
        if (i == 2) {
          assert(a.map(_.depth).toSet === Set(1),
            s"late event leaked into the funnel state: $a")
          assert(a.size === 1, s"late-only batch must emit nothing: $a")
        }
        if (i == 3) {
          // the batch aggregate over the non-late events {s1@10, s2@101}
          // is 1 — and so is the twin's final depth
          assert(a.map(_.depth).max === 1, s"depth must stay 1: $a")
          assert(!a.exists(_.depth == 2), a.toString)
        }
    }
  }
}
