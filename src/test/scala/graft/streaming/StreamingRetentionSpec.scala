package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

case class SREvent(u: Long, w: Long, sg: Boolean)

/** Streaming cohort/retention ([[StreamingRetention]]): after ANY
  * delivered prefix, the matrix reconciled from the latest per-user
  * snapshots equals the batch `q50_cohort_matrix` derivation over
  * that prefix — regardless of chunking and of signup arrival order.
  */
class StreamingRetentionSpec extends SparkSpec with BeforeAndAfterAll {
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

  /** The batch pipeline's matrix over a prefix — the exact
    * `q50_cohort_matrix` shape (min-signup cohorts, distinct activity
    * weeks, w >= cohort filter, distinct-user counts). */
  private def batchMatrix(events: Seq[SREvent]): Map[(Long, Long), Long] = {
    if (events.isEmpty) return Map.empty
    val wk = events.toDF("u", "w", "sg")
    val cohorts = wk.filter(col("sg")).groupBy(col("u")).agg(min(col("w")).as("c"))
    wk.select(col("u"), col("w")).distinct()
      .join(cohorts, "u")
      .filter(col("w") >= col("c"))
      .groupBy(col("c"), (col("w") - col("c")).as("o"))
      .agg(countDistinct(col("u")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  /** Reconcile an update-mode sink's rows: snapshots are cumulative
    * (weeks only grow, cohort only drops), so union-of-weeks and
    * min-of-cohorts IS the latest snapshot per user — robust to the
    * sink's row order. */
  private def reconcile(rows: Seq[StreamingRetention.UserCohort])
      : Seq[StreamingRetention.UserCohort] =
    rows.groupBy(_.user_id).map { case (u, snaps) =>
      val cohorts = snaps.map(_.cohort_week).filter(_ >= 0)
      StreamingRetention.UserCohort(u,
        if (cohorts.isEmpty) -1L else cohorts.min,
        snaps.flatMap(_.weeks).distinct.sorted.toArray)
    }.toSeq

  private def streamMatrix(rows: Seq[StreamingRetention.UserCohort])
      : Map[(Long, Long), Long] =
    StreamingRetention.matrix(reconcile(rows).toDS())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** Feed chunks, invoking `check(deliveredPrefix, sinkRows)` after
    * every trigger. */
  private def run(chunks: Seq[Seq[SREvent]])(
      check: (Seq[SREvent], Seq[StreamingRetention.UserCohort]) => Unit): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SREvent]
    val sink = s"sret_${System.nanoTime()}"
    val q = StreamingRetention.cohorts(ms.toDF(), col("u"), col("w"), col("sg"))
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .start()
    try {
      var delivered = Seq.empty[SREvent]
      chunks.foreach { c =>
        ms.addData(c)
        q.processAllAvailable()
        delivered = delivered ++ c
        check(delivered,
          spark.table(sink).as[StreamingRetention.UserCohort].collect().toSeq)
      }
    } finally q.stop()
  }

  test("matrix equals the batch pipeline after EVERY prefix, any chunking") {
    val rnd = new Random(17)
    val events = Seq.fill(500)(SREvent(
      rnd.nextInt(25).toLong, rnd.nextInt(10).toLong, rnd.nextInt(4) == 0))
    for (chunkSize <- Seq(500, 60, 9)) {
      run(events.grouped(chunkSize).toSeq) { (prefix, rows) =>
        assert(streamMatrix(rows) === batchMatrix(prefix),
          s"chunk size $chunkSize diverged at prefix ${prefix.length}")
      }
    }
  }

  test("a late-arriving EARLIER signup lowers the cohort and reclassifies prior weeks") {
    val chunks = Seq(
      Seq(SREvent(1, 5, sg = false), SREvent(1, 6, sg = false)), // activity first
      Seq(SREvent(1, 4, sg = true)),                             // late signup, week 4
      Seq(SREvent(1, 2, sg = true)))                             // even earlier signup
    run(chunks) { (prefix, rows) =>
      assert(streamMatrix(rows) === batchMatrix(prefix))
    }
    // after everything: cohort 2; weeks {2,4,5,6} -> offsets 0,2,3,4
    val finalRows = {
      var out = Seq.empty[StreamingRetention.UserCohort]
      run(Seq(chunks.flatten)) { (_, rows) => out = rows }
      reconcile(out)
    }
    assert(finalRows.head.cohort_week === 2L)
    assert(finalRows.head.weeks.toSeq === Seq(2L, 4L, 5L, 6L))
  }

  test("users without a signup carry cohort -1 and never enter the matrix") {
    run(Seq(Seq(SREvent(7, 3, sg = false), SREvent(8, 1, sg = true)))) {
      (_, rows) =>
        val rec = reconcile(rows)
        assert(rec.find(_.user_id == 7L).get.cohort_week === -1L)
        val m = streamMatrix(rows)
        assert(m === Map((1L, 0L) -> 1L), s"only the signed-up user counts: $m")
    }
  }
}
