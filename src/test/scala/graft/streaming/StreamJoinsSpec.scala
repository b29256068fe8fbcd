package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class Click(user_id: Long, ts: Timestamp, click_id: Long)
case class Purchase(user_id: Long, ts: Timestamp, purchase_id: Long)

/** Watermarked stream-stream interval join: matches within the
  * window emit; pairs outside the window or across users never do;
  * state is bounded by the watermark (Spark rejects unbounded
  * stream-stream joins in append mode without one).
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("attribution joins purchases to same-user clicks within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val joined = StreamJoins.attribution(
      clicks.toDF(), purchases.toDF(), window = "1 hour", watermark = "1 hour")
      .selectExpr("c.click_id", "p.purchase_id")
    val q = joined.writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      clicks.addData(
        Click(1L, t("01:00"), 101L),  // matched by purchase 201 (+30 min)
        Click(1L, t("05:00"), 102L),  // no purchase within an hour
        Click(2L, t("01:10"), 103L))  // other user — must not match 201
      purchases.addData(
        Purchase(1L, t("01:30"), 201L),
        Purchase(1L, t("08:00"), 202L), // no click within the preceding hour
        Purchase(2L, t("01:15"), 203L)) // matches click 103
      q.processAllAvailable()
      val out = spark.table("attrib_out").as[(Long, Long)].collect().toSet
      assert(out === Set((101L, 201L), (103L, 203L)))
    } finally q.stop()
  }

  test("stream-stream join state is watermark-bounded (metrics expose removed rows)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val q = StreamJoins.attribution(
        clicks.toDF(), purchases.toDF(), window = "1 hour", watermark = "1 hour")
      .selectExpr("c.click_id", "p.purchase_id")
      .writeStream.format("memory").queryName("attrib_state")
      .outputMode("append").start()
    try {
      clicks.addData(Click(1L, t("01:00"), 101L))
      purchases.addData(Purchase(1L, t("01:30"), 201L))
      q.processAllAvailable()
      // push both watermarks far past 01:00's expiry horizon
      clicks.addData(Click(1L, t("23:00"), 109L))
      purchases.addData(Purchase(1L, t("23:00"), 209L))
      q.processAllAvailable()
      clicks.addData(Click(1L, t("23:30"), 110L))
      purchases.addData(Purchase(1L, t("23:30"), 210L))
      q.processAllAvailable()
      val removed = q.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsRemoved)).sum
      assert(removed > 0, "expired join state must be evicted, not retained")
    } finally q.stop()
  }
}
