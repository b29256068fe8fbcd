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
}
