package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Semantics pin for [[Queries.docBm25]] on a hand-computable corpus:
  * the oracle proves Spark ≡ DuckDB on the same expression, but only
  * this suite proves the expression IS Okapi BM25 (rational-idf
  * variant) — df discrimination, tf saturation, and length
  * normalization each checked against closed-form expectations.
  */
class Bm25Spec extends SparkSpec {

  // query terms are fixed in the operator: spark, merge, window, stream
  private def corpus(): String = {
    import spark.implicits._
    val docs = Seq(
      // doc 1: two distinct query terms, short doc
      (1L, "spark merge alpha beta"),
      // doc 2: same terms but diluted in a longer doc — length
      // normalization must score it BELOW doc 1
      (2L, "spark merge alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // doc 3: one query term repeated — saturation must keep it
      // below two distinct mid-idf terms at comparable length
      (3L, "spark spark spark alpha"),
      // doc 4: the only doc with the rarer term "stream"
      (4L, "stream alpha beta gamma"),
      // doc 5: no query terms — must be absent from the output
      (5L, "alpha beta gamma delta"))
    val dir = Files.createTempDirectory("bm25").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def bm25(tf: Long, df: Long, dl: Long, nDocs: Long, sumDl: Long): Double = {
    val idf = (nDocs.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val sat = (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
    math.floor(idf * sat * 16777216.0) / 16777216.0
  }

  test("docBm25 matches closed-form scores and BM25 orderings") {
    val rows = Queries.docBm25(spark, corpus()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dl"), r.getAs[Long]("n_hit"), r.getAs[Double]("score_q")))
      .toMap

    assert(!rows.contains(5L), "doc without query terms must not score")
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))

    // n=5 docs, sum_dl = 4+12+4+4+4 = 28; df(spark)=3, df(merge)=2, df(stream)=1
    val sumDl = 28L
    assert(rows(1L)._3 ==
      bm25(1, 3, 4, 5, sumDl) + bm25(1, 2, 4, 5, sumDl))
    assert(rows(2L)._3 ==
      bm25(1, 3, 12, 5, sumDl) + bm25(1, 2, 12, 5, sumDl))
    assert(rows(3L)._3 == bm25(3, 3, 4, 5, sumDl))
    assert(rows(4L)._3 == bm25(1, 1, 4, 5, sumDl))

    assert(rows(1L)._2 == 2 && rows(4L)._2 == 1, "n_hit counts distinct matched terms")
    // length normalization: same terms, longer doc scores lower
    assert(rows(1L)._3 > rows(2L)._3)
    // idf discrimination: the unique term beats one common term tripled
    assert(rows(4L)._3 > rows(3L)._3)
  }
}
