package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    (1L, "A", 100L),
    (2L, "A", 205L),
    (3L, "B", 150L),
    (4L, "C", 100L) // no quotes for C
  ).toDF("trade_id", "sym", "t")

  private val quotes = Seq(
    ("A", 90L, 10.0),
    ("A", 200L, 11.0),
    ("A", 205L, 12.0), // equal-time quote: inclusive match
    ("A", 300L, 13.0), // future quote: never matched
    ("B", 150L, 20.0)
  ).toDF("sym", "qt", "px")

  test("asOf picks the latest quote at or before each trade, null when none") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "t", "sym", "qt", Seq("px"))
      .orderBy($"trade_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      (1L, Some(10.0)),  // 90 <= 100 < 200
      (2L, Some(12.0)),  // equal-time 205 matches inclusively
      (3L, Some(20.0)),  // exact time match
      (4L, None)))       // no C quotes
  }

  test("asOf attaches the matched row ATOMICALLY: its NULL fields stay NULL, never back-filled from older rows") {
    // latest A quote before t=100 has px NULL but note set; per-column
    // carry would back-fill px=10.0 from the OLDER 90-quote — true
    // AS-OF (and DuckDB ASOF) keeps the matched row's NULL
    val q = Seq(
      ("A", 90L, Some(10.0), Some("old")),
      ("A", 95L, None: Option[Double], Some("newest"))
    ).toDF("sym", "qt", "px", "note")
    val out = AsOfJoin.asOf(
        trades.filter($"trade_id" === 1L), q, "sym", "t", "sym", "qt", Seq("px", "note"))
      .collect().map(r => (Option(r.get(3)), Option(r.get(4))))
    assert(out.toSeq === Seq((None, Some("newest"))))
  }

  test("asOf attaches multiple payload columns consistently") {
    val q2 = quotes.withColumn("src", org.apache.spark.sql.functions.concat(
      $"sym", org.apache.spark.sql.functions.lit("@"), $"qt"))
    val out = AsOfJoin.asOf(trades, q2, "sym", "t", "sym", "qt", Seq("px", "src"))
      .orderBy($"trade_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    assert(out(0) === ((1L, Some(10.0), Some("A@90"))))
    assert(out(3) === ((4L, None, None)))
  }
}
