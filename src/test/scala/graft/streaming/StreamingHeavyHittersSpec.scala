package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

case class SHKey(g: String, k: Long)

/** Streaming Misra-Gries ([[StreamingHeavyHitters]]): the batch
  * sketch's deterministic guarantee must hold over the WHOLE stream
  * prefix after folding arrivals in across micro-batches, state must
  * stay bounded at m entries per group, and capacity >= distinct
  * keys must degenerate to exact running counts.
  */
class StreamingHeavyHittersSpec extends SparkSpec with BeforeAndAfterAll {
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

  /** Drive chunks through the trending op, one micro-batch per chunk;
    * returns every update-mode emission in arrival order.
    */
  private def run(chunks: Seq[Seq[SHKey]], m: Int):
      Seq[StreamingHeavyHitters.GroupHitters] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SHKey]
    val sink = s"shh_${System.nanoTime()}"
    val q = StreamingHeavyHitters.trending(ms.toDF(), col("g"), col("k"), m)
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode("update")
      .start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    spark.table(sink)
      .as[StreamingHeavyHitters.GroupHitters].collect().toSeq
  }

  /** Latest emission per group = the one with the largest prefix n. */
  private def latest(all: Seq[StreamingHeavyHitters.GroupHitters]):
      Map[String, StreamingHeavyHitters.GroupHitters] =
    all.groupBy(_.group).map { case (g, v) => g -> v.maxBy(_.total_n) }

  test("stream-prefix guarantee holds across micro-batches") {
    val m = 8
    val rnd = new scala.util.Random(13)
    // skewed: key 1 carries ~40% of group a, key 2 ~20%
    val arrivals = Seq.fill(3000) {
      val g = if (rnd.nextBoolean()) "a" else "b"
      val u = rnd.nextDouble()
      val k = if (u < 0.4) 1L else if (u < 0.6) 2L else (u * 100).toLong
      SHKey(g, k)
    }
    val chunks = arrivals.grouped(1000).toSeq
    val fin = latest(run(chunks, m))
    val truth = arrivals.groupBy(_.g).map { case (g, v) =>
      g -> v.groupBy(_.k).map { case (k, r) => k -> r.size.toLong }
    }
    fin.foreach { case (g, gh) =>
      val t = truth(g)
      assert(gh.total_n === t.values.sum, s"prefix n wrong for $g")
      val bound = gh.total_n.toDouble / (m + 1)
      assert(gh.hitters.size <= m, s"state exceeded capacity for $g")
      gh.hitters.foreach { h =>
        val tr = t.getOrElse(h.key, 0L)
        assert(h.est <= tr, s"overestimate for $g/${h.key}")
        assert(tr - h.est <= bound, s"deficit out of bound for $g/${h.key}")
      }
      t.filter(_._2 > bound).foreach { case (k, c) =>
        assert(gh.hitters.exists(_.key == k),
          s"guaranteed-heavy $g/$k (count $c) missing from stream state")
      }
    }
  }

  test("capacity >= distinct keys => exact running counts per group") {
    val chunks = Seq(
      Seq(SHKey("a", 1), SHKey("a", 1), SHKey("a", 2), SHKey("b", 9)),
      Seq(SHKey("a", 1), SHKey("a", 3), SHKey("b", 9), SHKey("b", 8)))
    val fin = latest(run(chunks, m = 16))
    assert(fin("a").hitters.map(h => h.key -> h.est).toMap ===
      Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    assert(fin("b").hitters.map(h => h.key -> h.est).toMap ===
      Map(9L -> 2L, 8L -> 1L))
    assert(fin("a").total_n === 5 && fin("b").total_n === 3)
  }

  test("every trigger re-emits the group's refreshed summary (update mode)") {
    val chunks = Seq(Seq(SHKey("a", 1)), Seq(SHKey("a", 1)))
    val all = run(chunks, m = 4)
    val aEmits = all.filter(_.group == "a").sortBy(_.total_n)
    assert(aEmits.map(_.total_n) === Seq(1L, 2L))
    assert(aEmits.last.hitters === Seq(StreamingHeavyHitters.HitterEntry(1L, 2L)))
  }
}
