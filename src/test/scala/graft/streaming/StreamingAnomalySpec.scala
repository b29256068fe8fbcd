package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

case class SARow(g: String, id: Long, t: Long, v: Double)

/** [[StreamingAnomaly]]: flags must match an imperative Welford
  * replay over the same arrival order, be invariant to micro-batch
  * chunking, and judge each arrival against the baseline BEFORE it
  * folds in.
  */
class StreamingAnomalySpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

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

  private def run(chunks: Seq[Seq[SARow]], k: Double, minN: Long):
      Seq[StreamingAnomaly.Anomaly] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SARow]
    val sink = s"sa_${System.nanoTime()}"
    val q = StreamingAnomaly.detect(ms.toDF(),
        col("g"), col("id"), col("t"), col("v"), k, minN)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    spark.table(sink).as[StreamingAnomaly.Anomaly].collect().toSeq
  }

  /** Independent truth: fold rows per group in (t, id) order. */
  private def replay(rows: Seq[SARow], k: Double, minN: Long): Set[Long] = {
    val out = Set.newBuilder[Long]
    rows.groupBy(_.g).foreach { case (_, rs) =>
      var n = 0L; var mean = 0.0; var m2 = 0.0
      rs.sortBy(r => (r.t, r.id)).foreach { r =>
        if (n >= minN) {
          val sd = math.sqrt(m2 / n)
          if (sd > 0 && math.abs(r.v - mean) > k * sd) out += r.id
        }
        n += 1; val d = r.v - mean; mean += d / n; m2 += d * (r.v - mean)
      }
    }
    out.result()
  }

  private def mkRows(): Seq[SARow] = {
    val rnd = new scala.util.Random(7)
    // two groups with different scales; spikes planted at known ids
    (0 until 400).map { i =>
      val g = if (i % 2 == 0) "click" else "error"
      val base = if (g == "click") 10.0 else 50.0
      val v =
        if (i == 301) base * 8         // spike after baseline exists
        else if (i == 350) -base * 6   // negative spike
        else base + rnd.nextGaussian()
      SARow(g, i.toLong, 1000L + i, v)
    }
  }

  test("flags match the imperative Welford replay, spikes included") {
    val rows = mkRows()
    val got = run(rows.grouped(97).toSeq, k = 3.0, minN = 30L)
    val expected = replay(rows, 3.0, 30L)
    assert(got.map(_.id).toSet === expected)
    assert(Set(301L, 350L).subsetOf(expected), "planted spikes must flag")
    // z-signs match spike directions
    val byId = got.map(a => a.id -> a).toMap
    assert(byId(301L).z > 3.0 && byId(350L).z < -3.0)
  }

  test("micro-batch chunking does not change the flag set") {
    val rows = mkRows()
    val a = run(Seq(rows), 3.0, 30L).map(_.id).toSet
    val b = run(rows.grouped(23).toSeq, 3.0, 30L).map(_.id).toSet
    assert(a === b)
  }

  test("no flags before the minN baseline exists") {
    // a wild first value judged against a 2-row "baseline" must not flag
    val rows = (0 until 20).map(i => SARow("g", i.toLong, i.toLong,
      if (i == 10) 1e6 else 1.0))
    assert(run(Seq(rows), 3.0, 30L).isEmpty)
  }
}
