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
