package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class TimedEvent(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Watermarked event-time windows on a MemoryStream: finalized
  * windows emit in append mode; events later than the watermark are
  * dropped — the state-bounding contract that keeps streaming
  * aggregation memory O(active windows).
  *
  * Pattern: one live query with the default micro-batch trigger;
  * `processAllAvailable()` after each `addData` lets Spark run the
  * no-data batches that advance the watermark and flush finalized
  * windows.
  */
class WindowedAggsSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // windowed/session state on RocksDB (the at-scale provider);
  // restored after the suite
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

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def startQuery(df: DataFrame, name: String) =
    df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()

  test("tumbling windows finalize in append mode once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TimedEvent]
    val q = startQuery(
      WindowedAggs.tumbling(ms.toDF(), size = "6 hours", watermark = "1 hour"),
      "tumbling_out")
    try {
      ms.addData(
        TimedEvent(t("01:00"), 1, "click", 1.0),
        TimedEvent(t("02:00"), 2, "click", 2.0))
      q.processAllAvailable()
      // watermark still below 06:00 → nothing finalized yet
      assert(spark.table("tumbling_out").count() === 0)
      // 08:00 event → watermark 07:00 → [00:00,06:00) finalizes
      ms.addData(TimedEvent(t("08:00"), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .selectExpr("window.start", "cnt", "total_value")
        .as[(Timestamp, Long, Double)].collect()
      assert(rows.toSeq === Seq((t("00:00"), 2L, 3.0)))
      // windowed-agg state really runs on RocksDB (provider-specific
      // custom metrics present)
      import scala.jdk.CollectionConverters._
      val metricKeys = q.lastProgress.stateOperators.head.customMetrics.keySet().asScala
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"expected RocksDB state store metrics, got $metricKeys")
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TimedEvent]
    val q = startQuery(
      WindowedAggs.tumbling(ms.toDF(), size = "1 hour", watermark = "1 hour")
        .select($"window.start".as("ws"), $"cnt"),
      "wm_out")
    try {
      ms.addData(TimedEvent(t("01:30"), 1, "click", 1.0),
        TimedEvent(t("06:00"), 2, "click", 1.0)) // watermark → 05:00
      q.processAllAvailable()
      // [01:00,02:00) is already finalized (end 02:00 < 05:00) with 1 event
      ms.addData(TimedEvent(t("01:45"), 3, "click", 1.0)) // LATE → dropped
      q.processAllAvailable()
      ms.addData(TimedEvent(t("12:00"), 4, "click", 1.0)) // flush the rest
      q.processAllAvailable()
      val emitted = spark.table("wm_out").as[(Timestamp, Long)].collect().toSeq
      assert(emitted.count(_._1 == t("01:00")) === 1)
      assert(emitted.toMap.apply(t("01:00")) === 1L, "late event must not count")
      assert(emitted.toMap.apply(t("06:00")) === 1L)
    } finally q.stop()
  }

  test("sliding windows assign each event to size/slide windows") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TimedEvent]
    val q = startQuery(
      WindowedAggs.sliding(ms.toDF(), size = "6 hours", slide = "3 hours",
        watermark = "1 hour"),
      "sliding_out")
    try {
      ms.addData(TimedEvent(t("04:00"), 1, "view", 1.0))
      ms.addData(TimedEvent(t("23:00"), 2, "view", 1.0)) // watermark pusher
      q.processAllAvailable()
      val wins = spark.table("sliding_out")
        .selectExpr("window.start").as[Timestamp].collect().toSet
      assert(wins === Set(t("00:00"), t("03:00")))
    } finally q.stop()
  }

  test("session windows merge events within the gap and split across it") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TimedEvent]
    val q = startQuery(
      WindowedAggs.sessions(ms.toDF(), gap = "30 minutes", watermark = "1 hour"),
      "session_out")
    try {
      ms.addData(
        TimedEvent(t("01:00"), 7, "click", 1.0),
        TimedEvent(t("01:10"), 7, "click", 1.0), // same session (gap 30m)
        TimedEvent(t("02:30"), 7, "click", 1.0)) // new session
      ms.addData(TimedEvent(t("09:00"), 8, "click", 1.0)) // watermark pusher
      q.processAllAvailable()
      val sessions = spark.table("session_out")
        .filter($"user_id" === 7)
        .selectExpr("session_window.start", "cnt")
        .as[(Timestamp, Long)].collect().toMap
      assert(sessions === Map(t("01:00") -> 2L, t("02:30") -> 1L))
    } finally q.stop()
  }
}
