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
