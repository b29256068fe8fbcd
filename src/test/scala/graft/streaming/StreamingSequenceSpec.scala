package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

case class SSEvent(u: Long, t: Long, eid: Long, c: String)

/** Streaming sequence match ([[StreamingSequence]]): after ANY
  * delivered prefix — any chunking, any arrival order — the latest
  * per-user snapshot equals the batch `q51_sequence_match`
  * derivation over that prefix.
  */
class StreamingSequenceSpec extends SparkSpec with BeforeAndAfterAll {
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

  /** The batch pipeline over a prefix — the EXACT q51 expressions
    * (array_sort on (t, eid, c), rlike, regexp_extract_all) so any
    * regex-semantics drift between batch and streaming shows up. */
  private def batchScores(events: Seq[SSEvent]): Map[Long, (String, Long, Long)] = {
    if (events.isEmpty) return Map.empty
    events.toDF("u", "t", "eid", "c")
      .groupBy(col("u"))
      .agg(array_sort(collect_list(
        struct(col("t"), col("eid"), col("c")))).as("evs"))
      .select(col("u"),
        array_join(transform(col("evs"), x => x.getField("c")), "").as("seq"))
      .select(col("u"), col("seq"),
        col("seq").rlike("s.*p.*e").cast("long").as("m"),
        size(expr("regexp_extract_all(seq, 's.*?p', 0)")).cast("long").as("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  /** Latest snapshot per user from an update-mode sink: seq only
    * grows, so the LONGEST (ties broken by content equality — a
    * replay re-emits identical rows) is the latest. */
  private def reconcile(rows: Seq[StreamingSequence.UserSequence])
      : Map[Long, (String, Long, Long)] =
    rows.groupBy(_.user_id).map { case (u, snaps) =>
      val latest = snaps.maxBy(_.seq.length)
      u -> ((latest.seq, latest.matched_spe, latest.n_sp))
    }

  private def run(chunks: Seq[Seq[SSEvent]])(
      check: (Seq[SSEvent], Seq[StreamingSequence.UserSequence]) => Unit): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SSEvent]
    val sink = s"sseq_${System.nanoTime()}"
    val q = StreamingSequence.sequences(
        ms.toDF(), col("u"), col("t"), col("eid"), col("c"))
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .start()
    try {
      var delivered = Seq.empty[SSEvent]
      chunks.foreach { ch =>
        ms.addData(ch)
        q.processAllAvailable()
        delivered = delivered ++ ch
        check(delivered,
          spark.table(sink).as[StreamingSequence.UserSequence].collect().toSeq)
      }
    } finally q.stop()
  }

  test("snapshots equal the batch q51 derivation after EVERY prefix, any chunking") {
    val rnd = new Random(41)
    val codes = "spec v".trim.toCharArray // s,p,e,c,v
    val events = (1 to 400).map(i => SSEvent(
      rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong,
      codes(rnd.nextInt(codes.length)).toString))
    for (chunkSize <- Seq(400, 45, 7)) {
      run(events.grouped(chunkSize).toSeq) { (prefix, rows) =>
        assert(reconcile(rows) === batchScores(prefix),
          s"chunk size $chunkSize diverged at prefix ${prefix.length}")
      }
    }
  }

  test("a late-arriving EARLIER event re-sorts the sequence and flips the match") {
    val chunks = Seq(
      Seq(SSEvent(1, 20, 2, "p"), SSEvent(1, 30, 3, "e")), // pe: no match
      Seq(SSEvent(1, 10, 1, "s")))                         // late s BEFORE them
    var last = Map.empty[Long, (String, Long, Long)]
    run(chunks) { (prefix, rows) =>
      last = reconcile(rows)
      assert(last === batchScores(prefix))
    }
    assert(last(1L) === (("spe", 1L, 1L)), last.toString)
  }

  test("redelivering an identical chunk (at-least-once replay) leaves snapshots unchanged") {
    val chunk = Seq(SSEvent(5, 1, 1, "s"), SSEvent(5, 2, 2, "p"))
    run(Seq(chunk, chunk)) { (_, rows) =>
      val rec = reconcile(rows)
      assert(rec(5L) === (("sp", 0L, 1L)), rec.toString)
    }
  }

  // ---- watermark-bounded variant ([[StreamingSequence.sequencesWatermarked]]) ----

  /** Drive the watermarked twin chunk-by-chunk; yields ALL sink rows
    * so far after each chunk (timestamps: t is epoch seconds — the
    * operator casts bigint→timestamp). processAllAvailable also runs
    * Spark's no-data micro-batches, so watermark-advance-driven
    * timeouts fire inside the SAME step that advanced the watermark
    * when the engine supports it, or on the next data batch when it
    * doesn't — assertions below are written to hold either way. */
  private def runWatermarked(chunks: Seq[Seq[SSEvent]], delay: String,
                             horizonMs: Long)(
      check: (Int, Seq[StreamingSequence.UserSequence]) => Unit): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[SSEvent]
    val sink = s"sseqw_${System.nanoTime()}"
    val q = StreamingSequence.sequencesWatermarked(
        ms.toDF(), col("u"), col("t"), col("eid"), col("c"),
        watermarkDelay = delay, horizonMs = horizonMs)
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .start()
    try chunks.zipWithIndex.foreach { case (ch, i) =>
      ms.addData(ch)
      q.processAllAvailable()
      check(i,
        spark.table(sink).as[StreamingSequence.UserSequence].collect().toSeq)
    } finally q.stop()
  }

  test("watermarked twin equals the batch q51 derivation while the horizon is open") {
    val rnd = new Random(43)
    val codes = "spec v".trim.toCharArray
    // t >= 1: Spark's exec-level late filter drops ts <= watermark,
    // and the INITIAL watermark is 0 ms — an epoch-0 event is always
    // late by definition (found by this test's first run)
    val events = (1 to 400).map(i => SSEvent(
      rnd.nextInt(20).toLong, rnd.nextInt(50).toLong + 1, i.toLong,
      codes(rnd.nextInt(codes.length)).toString))
    // delay far beyond the ts range: nothing is ever late; horizon
    // far beyond it: nothing is ever evicted — the twin must match
    // the unbounded batch derivation after every prefix, any order
    val chunks = events.grouped(45).toSeq
    var delivered = Seq.empty[SSEvent]
    runWatermarked(chunks, delay = "10000 seconds", horizonMs = 10000000L) {
      (i, rows) =>
        delivered = delivered ++ chunks(i)
        val expected = batchScores(delivered).map { case (u, (s, m, n)) =>
          u -> ((s, m, n)) }
        assert(reconcile(rows) === expected, s"diverged after chunk $i")
    }
  }

  test("event-time eviction fires only after the watermark passes latest event + horizon") {
    // delay 0s => watermark == max event time seen so far (as of the
    // previous batch). horizon 100s. Walk the boundary:
    //   chunk0: A at t=10(s), t=20(p)        -> A timeout target 120s
    //   chunk1: B at t=115 -> wm 20 during batch; after batch wm=115
    //   chunk2: B at t=118 -> wm 115 < 120: A MUST still be live
    //   chunk3: A at t=119(e) -> in-order (119 >= wm 118); extends to
    //           "spe" — proves eviction never fired while in-order
    //           data for A could still arrive; timeout moves to 219
    //   chunk4: B at t=230 -> after batch wm=230 > 219 (eviction due)
    //   chunk5: B at t=231 -> guarantees a batch runs with wm>219
    //           even if no-data batches are disabled: A evicted,
    //           closing "spe" row emitted
    //   chunk6: A at t=240(s) -> fresh sequence "s", NOT "spes" —
    //           state was really dropped
    val chunks = Seq(
      Seq(SSEvent(1, 10, 1, "s"), SSEvent(1, 20, 2, "p")),
      Seq(SSEvent(2, 115, 3, "v")),
      Seq(SSEvent(2, 118, 4, "v")),
      Seq(SSEvent(1, 119, 5, "e")),
      Seq(SSEvent(2, 230, 6, "v")),
      Seq(SSEvent(2, 231, 7, "v")),
      Seq(SSEvent(1, 240, 8, "s")))
    runWatermarked(chunks, delay = "0 seconds", horizonMs = 100000L) {
      (i, rows) =>
        val a = rows.filter(_.user_id == 1L)
        if (i == 2) {
          // wm is 115..118 — far past A's latest event (20) but
          // inside the horizon: not evicted, snapshot intact
          assert(a.map(_.seq).toSet === Set("sp"), a.toString)
        }
        if (i == 3) {
          // the in-order late-boundary event still lands: "spe",
          // scored like the batch (matched, one s..p)
          assert(a.exists(r => r.seq == "spe" && r.matched_spe == 1L
            && r.n_sp == 1L), a.toString)
        }
        if (i == 5) {
          // eviction fired (in chunk4's no-data batch or chunk5's
          // data batch): exactly one CLOSING "spe" row beyond the
          // update-mode one — final snapshot equals the batch value
          // over A's watermark-retained events
          assert(a.count(_.seq == "spe") === 2, a.toString)
        }
        if (i == 6) {
          // post-eviction return starts a FRESH sequence
          assert(a.exists(_.seq == "s"), a.toString)
          assert(!a.exists(_.seq == "spes"), a.toString)
        }
    }
  }

  test("an event older than the watermark is dropped, exactly like a batch time bound") {
    // delay 0s, huge horizon (no eviction interference):
    //   chunk0: A t=10 "s"; chunk1: B t=100 pushes wm to 100;
    //   chunk2: A t=50 "p" — 50 < wm 100: LATE, must not mutate A
    val chunks = Seq(
      Seq(SSEvent(1, 10, 1, "s")),
      Seq(SSEvent(2, 100, 2, "v")),
      Seq(SSEvent(1, 50, 3, "p")))
    runWatermarked(chunks, delay = "0 seconds", horizonMs = 100000000L) {
      (i, rows) =>
        val a = rows.filter(_.user_id == 1L)
        if (i == 2) {
          assert(a.map(_.seq).toSet === Set("s"),
            s"late event leaked into state: $a")
          assert(a.size === 1, a.toString)
        }
    }
  }

  test("non-greedy subsequence count matches the batch on overlapping patterns") {
    // ssspp: rlike finds no 'e'; s.*?p non-greedy counts ONE (first
    // match consumes sssp, leaving only 'p') — the known asymmetry
    // the batch query ships; the twin must reproduce it, not "fix" it
    val chunk = (1 to 5).zip("ssspp").map { case (i, ch) =>
      SSEvent(9, i.toLong, i.toLong, ch.toString) }
    run(Seq(chunk)) { (prefix, rows) =>
      val rec = reconcile(rows)
      assert(rec === batchScores(prefix))
      assert(rec(9L)._3 === 1L, rec.toString)
    }
  }
}
