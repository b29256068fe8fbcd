package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[QueriesOps.embPqCodes]]: structural invariants plus the one
  * property the oracle equality can't see — that the Lloyd iteration
  * actually IMPROVES the codebook (total quantization error after
  * the update ≤ before). A broken update that still mirrored in SQL
  * would pass the oracle; it would fail this.
  */
class EmbPqSpec extends SparkSpec {
  import spark.implicits._

  test("every vector gets one code per subspace, codes in [0, 8)") {
    val rows = QueriesOps.embPqCodes(spark, sfSmoke)
      .as[(Long, Long, Long)].collect()
    val nVecs = graft.tables.Tables.embeddings(spark, sfSmoke).count()
    assert(rows.length === nVecs * 4)
    assert(rows.forall { case (_, m, c) => m >= 0 && m < 4 && c >= 0 && c < 8 })
    rows.groupBy(_._1).foreach { case (_, perVec) =>
      assert(perVec.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    }
  }

  test("the Lloyd update does not increase total quantization error") {
    graft.GraftSession.tune(spark)
    val comps = graft.tables.Tables.embeddings(spark, sfSmoke)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), floor(col("dim") / 16).cast("long").as("m"),
        col("dim").cast("long").as("dim"), col("v").cast("double").as("v"))
    val seeds = comps.filter(col("vec_id") < 8)
      .select(col("m"), col("vec_id").as("code"), col("dim"), col("v").as("c"))

    // total error of an assignment against a codebook
    def err(codebook: org.apache.spark.sql.DataFrame): BigDecimal = {
      val dists = comps.join(broadcast(codebook), Seq("m", "dim"))
        .withColumn("sq",
          ((col("v") - col("c")) * (col("v") - col("c"))).cast("decimal(18,12)"))
        .groupBy(col("vec_id"), col("m"), col("code"))
        .agg(sum(col("sq")).as("d2"))
      dists.groupBy(col("vec_id"), col("m")).agg(min(col("d2")).as("best"))
        .agg(sum(col("best"))).head().getDecimal(0)
    }

    val e0 = err(seeds)
    // rebuild the post-update codebook the same way the query does
    val a1 = comps.join(broadcast(seeds), Seq("m", "dim"))
      .withColumn("sq",
        ((col("v") - col("c")) * (col("v") - col("c"))).cast("decimal(18,12)"))
      .groupBy(col("vec_id"), col("m"), col("code"))
      .agg(sum(col("sq")).as("d2"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.code").as("code"))
    val means = a1.join(comps, Seq("vec_id", "m"))
      .groupBy(col("m"), col("code"), col("dim"))
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1))).as("mu"))
    val cb2 = seeds.join(means, Seq("m", "code", "dim"), "left")
      .select(col("m"), col("code"), col("dim"), coalesce(col("mu"), col("c")).as("c"))
    val e1 = err(cb2)
    assert(e1 <= e0, s"Lloyd step increased error: $e0 -> $e1")
    assert(e1 < e0, "fixture should actually improve (seeds are raw samples)")
  }

  test("ADC search recalls most true neighbors (approximation quality)") {
    graft.GraftSession.tune(spark)
    val adc = QueriesOps.annAdcTop5(spark, sfSmoke)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    // exact truth: brute-force L2 top-5 per query
    import org.apache.spark.sql.functions._
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("""aggregate(zip_with(embedding, qv, (a, b) ->
                (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) *
                (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), 0.0D, (acc, x) -> acc + x)""")
          .as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val recalls = adc.map { case (q, got) =>
      got.intersect(exact(q)).size.toDouble / 5.0 }
    val mean = recalls.sum / recalls.size
    // 4 subspaces x 8 codewords = 12-bit codes — a deliberately tiny
    // demo quantizer over unclustered synthetic vectors. Chance
    // recall@5 is 5/499 ~= 0.01; measured ADC recall is ~0.24 (24x
    // chance). Assert the signal, not production recall (which needs
    // K=256 x 8 subspaces and real cluster structure).
    assert(mean >= 0.15, s"mean ADC recall@5 = $mean (chance ~0.01)")
  }

  test("hash classifier: score is the exact sum of per-token weights") {
    val got = QueriesOps.docHashClassifier(spark, sfSmoke)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // independent recomputation in Scala for a few docs
    val texts = graft.tables.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def weight(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 6), 16) % 1001L) - 500L
    }
    got.take(20).foreach { case (id, nTok, score, label) =>
      val toks = texts(id).split(" ", -1)
      assert(nTok === toks.length)
      assert(score === toks.map(weight).sum, s"doc $id")
      assert(label === (if (score >= 0) 1L else 0L))
    }
  }
}
