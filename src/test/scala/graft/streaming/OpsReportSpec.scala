package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The ops surface ([[OpsReport]]) against a real running stream —
  * health/progress rows populated, the bounded listener ring
  * retaining batch metrics, ring bounding under overflow.
  */
class OpsReportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-ops").toString

  test("health and progress report an active query's liveness and counters") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    ms.addData(1L to 50L: _*)
    val q = ms.toDF().withColumn("doubled", col("value") * 2)
      .writeStream
      .queryName("ops-probe")
      .format("noop")
      .option("checkpointLocation", tmp())
      .trigger(Trigger.ProcessingTime(50L))
      .start()
    try {
      assert(OpsReport.awaitFirstData(q, 30000L), "stream never processed data")
      val h = OpsReport.health(spark)
        .filter(col("name") === "ops-probe").collect()
      assert(h.length === 1)
      assert(h(0).getAs[Boolean]("is_active"))
      assert(h(0).getAs[String]("last_error") === "")
      val p = OpsReport.progress(spark)
        .filter(col("name") === "ops-probe").collect()
      assert(p.length === 1)
      assert(p(0).getAs[Long]("batch_id") >= 0L)
      assert(p(0).getAs[Long]("input_rows") > 0L)
    } finally q.stop()
  }

  test("progress surfaces a no-batch-yet query instead of dropping it") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long] // no data added; first trigger far away
    val q = ms.toDF().writeStream
      .queryName("ops-idle")
      .format("noop")
      .option("checkpointLocation", tmp())
      .trigger(Trigger.ProcessingTime(3600000L))
      .start()
    try {
      val p = OpsReport.progress(spark)
        .filter(col("name") === "ops-idle").collect()
      assert(p.length === 1)
      // -1 batch id = "stream started, nothing completed" — visible,
      // which is the point of a readiness probe
      assert(p(0).getAs[Long]("batch_id") === -1L ||
        p(0).getAs[Long]("input_rows") === 0L)
    } finally q.stop()
  }

  test("MetricsListener retains batch metrics and its report is queryable") {
    implicit val sqlCtx = spark.sqlContext
    val listener = new OpsReport.MetricsListener(keepPerQuery = 100)
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[Long]
      ms.addData(1L to 20L: _*)
      val q = ms.toDF().writeStream
        .queryName("ops-ring")
        .format("noop")
        .option("checkpointLocation", tmp())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      // listener events are delivered asynchronously after termination
      val deadline = System.nanoTime() + 30e9.toLong
      while (listener.snapshot().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20L)
      val samples = listener.snapshot().filter(_.queryId == q.id.toString)
      assert(samples.nonEmpty, "ring never received a progress event")
      assert(samples.map(_.numInputRows).sum === 20L)
      val rep = listener.report(spark)
        .filter(col("queryId") === q.id.toString)
        .agg(sum(col("numInputRows"))).collect()(0).getLong(0)
      assert(rep === 20L)
    } finally spark.streams.removeListener(listener)
  }

  test("the ring is bounded: overflow evicts oldest, never grows past the cap") {
    val listener = new OpsReport.MetricsListener(keepPerQuery = 3)
    (1L to 10L).foreach { b =>
      listener.record(OpsReport.BatchMetric("q1", b, 1L, 1.0, 1L, s"t$b"))
    }
    // a second query gets its own independent ring
    listener.record(OpsReport.BatchMetric("q2", 1L, 1L, 1.0, 1L, "t1"))
    val s1 = listener.snapshot().filter(_.queryId == "q1")
    assert(s1.size === 3)
    assert(s1.map(_.batchId).sorted === Seq(8L, 9L, 10L))
    assert(listener.snapshot().count(_.queryId == "q2") === 1)
  }
}
