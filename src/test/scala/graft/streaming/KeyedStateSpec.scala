package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

case class KeyedRow(k: String, payload: Long)

class KeyedStateSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  // run keyed state on RocksDB — the provider a 100 TB deployment
  // uses (bounded heap, state spills to local disk, changelog
  // checkpointing); restored after the suite so other suites keep
  // the default provider
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

  test("flatMapGroupsWithState dedups by key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedRow]
    // ttl <= 0 → NoTimeout: processing-time timeouts keep scheduling
    // no-data micro-batches, which deadlocks processAllAvailable()
    // under the default trigger in a test harness
    val q = KeyedState.dedupeByKey[KeyedRow](ms.toDS(), _.k, ttlMs = 0L)
      .writeStream.format("memory").queryName("keyed_dedup")
      .outputMode("append").start()
    try {
      ms.addData(KeyedRow("a", 1), KeyedRow("a", 2), KeyedRow("b", 3))
      q.processAllAvailable()
      // repeats in a LATER micro-batch are still dropped (state persists)
      ms.addData(KeyedRow("a", 4), KeyedRow("c", 5))
      q.processAllAvailable()
      val out = spark.table("keyed_dedup").as[KeyedRow].collect()
        .map(r => r.k -> r.payload).toMap
      assert(out.keySet === Set("a", "b", "c"))
      assert(out("a") === 1L, "first occurrence wins")
      assert(out("c") === 5L)
      // positive proof the state actually lives in RocksDB (its
      // provider exposes rocksdb* custom metrics; the HDFS-backed
      // default exposes none)
      import scala.jdk.CollectionConverters._
      val metricKeys = q.lastProgress.stateOperators.head.customMetrics.keySet().asScala
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"expected RocksDB state store metrics, got $metricKeys")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across batches with watermark-bounded state") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val q = ms.toDF().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      ms.addData((1L, t("01:00")), (1L, t("01:05")), (2L, t("01:10")))
      q.processAllAvailable()
      // same id in a LATER batch, still within the watermark window → dropped
      ms.addData((1L, t("01:20")))
      q.processAllAvailable()
      val ids = spark.table("wm_dedup").select(col("id")).as[Long].collect().toSeq
      assert(ids.sorted === Seq(1L, 2L))
    } finally q.stop()
  }

  test("TTL transition: repeats within TTL drop, repeats AFTER it re-admit (deterministic clock)") {
    // review-caught: Spark fires the timeout callback only for keys
    // with NO data in a trigger, so the data branch itself must
    // compare the stored admit time against the clock — otherwise a
    // key whose repeats keep arriving is suppressed forever instead
    // of re-admitted every ttlMs. TestGroupState injects the clock.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val ttl = 10000L
    def state(prev: Option[Long], nowMs: Long, timedOut: Boolean = false) =
      TestGroupState.create[Long](
        prev.map(v => Optional.of(v)).getOrElse(Optional.empty[Long]()),
        GroupStateTimeout.ProcessingTimeTimeout(), nowMs,
        Optional.empty[Long](), timedOut)

    // first sight at t=1000 → admitted, admit time stored
    val s1 = state(None, 1000L)
    assert(KeyedState.dedupeTransition(Iterator("x"), s1, ttl).toSeq === Seq("x"))
    assert(s1.get === 1000L)
    // repeat INSIDE the TTL → dropped, admit time unchanged
    val s2 = state(Some(1000L), 1000L + ttl - 1)
    assert(KeyedState.dedupeTransition(Iterator("x"), s2, ttl).isEmpty)
    assert(s2.get === 1000L)
    // repeat AT/AFTER the TTL → re-admitted, admit time refreshed
    val s3 = state(Some(1000L), 1000L + ttl)
    assert(KeyedState.dedupeTransition(Iterator("x"), s3, ttl).toSeq === Seq("x"))
    assert(s3.get === 1000L + ttl)
    // idle-key timeout callback reaps the state
    val s4 = state(Some(1000L), 1000L + ttl * 2, timedOut = true)
    assert(KeyedState.dedupeTransition(Iterator.empty, s4, ttl).isEmpty)
    assert(s4.isRemoved)
  }

  test("sketch parity: approx_count_distinct lands within its error bound of the exact count") {
    graft.GraftSession.tune(spark)
    val ev = graft.tables.Tables.eventsNorm(spark, sfSmoke)
    import org.apache.spark.sql.functions._
    val (approx, exact) = ev
      .agg(approx_count_distinct(col("user_id"), 0.05).as("a"),
        countDistinct(col("user_id")).as("e"))
      .as[(Long, Long)].collect().head
    assert(math.abs(approx - exact).toDouble / exact <= 0.10,
      s"approx $approx vs exact $exact")
  }
}
