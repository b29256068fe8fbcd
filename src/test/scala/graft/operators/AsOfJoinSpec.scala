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

  test("asOfBucketed handles carry-in, empty buckets, bucket-floor ties, and no-match") {
    // bucketWidth=100 → quotes at 90 (bucket 0) must carry into
    // bucket 1 and 2 across the EMPTY bucket for trade t=205;
    // quote at exactly 200 (bucket floor) must override the carry
    val out = AsOfJoin.asOfBucketed(
        trades, quotes, "sym", "t", "sym", "qt", Seq("px"), bucketWidth = 100L)
      .orderBy($"trade_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      (1L, Some(10.0)), (2L, Some(12.0)), (3L, Some(20.0)), (4L, None)))
  }

  test("asOfBucketed is equivalent to asOf on dense pseudo-random data (skewed keys, all widths)") {
    // 3 hot keys × hundreds of rows — exactly the shape asOf's
    // per-key window serializes and the bucketed variant exists for.
    // Deterministic LCG so the case is reproducible.
    def lcg(seed: Long): LazyList[Long] =
      LazyList.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    val rnd = lcg(42L).map(x => math.abs(x % 1000L))
    val lefts = (0 until 400).map { i =>
      (i.toLong, "K" + (rnd(i) % 3), rnd(i + 1000)) }.toDF("id", "k", "t")
    // unique right (k, t): index-stamped times, some NULL payload fields
    val rights = (0 until 300).map { i =>
      ("K" + (rnd(i + 2000) % 3), rnd(i + 3000) * 10 + i % 10,
        if (i % 7 == 0) None else Some(i.toDouble), "n" + i)
    }.distinctBy(r => (r._1, r._2)) // right (k, t) must be unique (API precondition)
      .toDF("k", "rt", "px", "note")

    val base = AsOfJoin.asOf(lefts, rights, "k", "t", "k", "rt", Seq("px", "note"))
      .orderBy($"id").collect().map(_.toSeq).toSeq
    for (w <- Seq(1L, 7L, 100L, 1000000L)) { // width 1, odd, mid, single-bucket
      val b = AsOfJoin.asOfBucketed(
          lefts, rights, "k", "t", "k", "rt", Seq("px", "note"), bucketWidth = w)
        .orderBy($"id").collect().map(_.toSeq).toSeq
      assert(b === base, s"divergence at bucketWidth=$w")
    }
  }

  test("asOfBucketed buckets exactly above 2^53 (no double-division drift)") {
    // nanosecond-scale epochs: a double round-trip of t/W drifts at
    // these magnitudes; the decimal floor-div must not
    val base = 1_700_000_000_000_000_000L // ~2023 in epoch nanos
    val l = Seq((1L, "A", base + 3_600_000_000_000L)).toDF("id", "k", "t")
    val r = Seq(("A", base + 1L, 42.0)).toDF("k", "rt", "px")
    val out = AsOfJoin.asOfBucketed(
        l, r, "k", "t", "k", "rt", Seq("px"), bucketWidth = 3_600_000_000_000L)
      .collect().map(row => Option(row.get(3)))
    assert(out.toSeq === Seq(Some(42.0)))
  }
}
