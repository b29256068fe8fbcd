package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress bench: runs the heavy operators on sf0.1 and on a
  * synthetically scaled copy (documents/embeddings ×26, events ×100)
  * and asserts near-linear scaling — wall-time AND shuffled bytes
  * must grow at most `slack`× the row ratio. This is the empirical
  * backing for the "scales to 100 TB" plan-shape arguments: a
  * quadratic pair blowup or a payload-carrying LSH join fails the
  * byte assertion long before it fails a review.
  *
  * Scaled data is built to preserve the SMALL corpus's similarity
  * structure instead of degenerating:
  *  - documents: 25 extra replicas per doc under per-replica Caesar
  *    rotation (`translate` over both alphabets) — each replica group
  *    is isomorphic to the original corpus but shares (almost) no
  *    shingles across groups, so near-dup pairs grow linearly in
  *    replicas, the way independent shards of a real corpus do.
  *    (Digit-only junk docs don't rotate — their replicas are true
  *    duplicates, a realistic bounded-duplication case.)
  *  - embeddings: per-replica circular dimension rotation — norms and
  *    pairwise similarities within a replica are preserved, across
  *    replicas vectors decorrelate.
  *  - events: per-replica user_id/event_id offsets — new users, same
  *    per-user session structure (horizontal growth).
  *
  * Prints one JSON line; non-linear scaling throws.
  */
object StressBench {

  private val lowerAz = "abcdefghijklmnopqrstuvwxyz"
  private val upperAz = lowerAz.toUpperCase

  private def rot(s: String, k: Int): String = s.drop(k % 26) + s.take(k % 26)

  def scaleDocuments(docs: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { k =>
      val text =
        if (k == 0) col("text")
        else translate(col("text"), lowerAz + upperAz, rot(lowerAz, k) + rot(upperAz, k))
      docs.select(
        (col("doc_id") + lit(k.toLong * 10_000_000L)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  def scaleEmbeddings(emb: DataFrame, replicas: Int, dims: Int): DataFrame =
    (0 until replicas).map { k =>
      val shift = k % dims
      val rotated =
        if (shift == 0) col("embedding")
        else concat(
          slice(col("embedding"), shift + 1, dims - shift),
          slice(col("embedding"), 1, shift))
      emb.select(
        (col("vec_id") + lit(k.toLong * 10_000_000L)).as("vec_id"),
        rotated.as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  def scaleEvents(ev: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { k =>
      ev.withColumn("event_id", col("event_id") + lit(k.toLong * 100_000_000L))
        .withColumn("user_id", col("user_id") + lit(k.toLong * 10_000_000L))
    }.reduce(_ unionByName _)

  /** Write the scaled tables under `outDir` — shared by [[StressBench]]
    * and [[StressBenchFull]] so the replica construction can't drift
    * between the two benches. `copyUnscaled` additionally copies the
    * TPC-H tables byte-identically so EVERY registered query resolves
    * against `outDir` (ratio-1 regression guards in the full bench).
    */
  def buildScaledTables(spark: SparkSession, sfDir: String, outDir: String,
                        docReplicas: Int, evReplicas: Int,
                        copyUnscaled: Boolean = false): Unit = {
    // beyond 26 the Caesar rotation (k % 26) — and beyond 64 dims the
    // embedding rotation — wraps to IDENTITY: replica groups become
    // exact cross-group duplicates, pair counts go quadratic, and the
    // near-linear assertions fail for the wrong reason
    require(docReplicas >= 1 && docReplicas <= 26,
      s"doc replicas must be in [1,26] (alphabet rotations), got $docReplicas")
    scaleDocuments(tables.Tables.documents(spark, sfDir), docReplicas)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(tables.Tables.embeddings(spark, sfDir), docReplicas, dims = 64)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    scaleEvents(tables.Tables.events(spark, sfDir), evReplicas)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    if (copyUnscaled)
      Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
        .foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet")
            .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
        }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR", "target/stress")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val docReplicas = sys.env.getOrElse("SPARK_GRAFT_STRESS_DOCS_X", "26").toInt
    val evReplicas = sys.env.getOrElse("SPARK_GRAFT_STRESS_EVENTS_X", "100").toInt
    val slack = 3.0
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    GraftSession.tune(spark)
    val meter = new org.apache.spark.graft.ShuffleBytesListener(spark.sparkContext)

    // --- build the scaled tables (not timed) -----------------------
    buildScaledTables(spark, sfDir, outDir, docReplicas, evReplicas)

    val ops: Seq[(String, Int)] = Seq( // name -> row ratio (R)
      "doc_quality" -> docReplicas,
      "dedup_minhash" -> docReplicas,
      "dedup_clusters" -> docReplicas,
      "corpus_clean_cc" -> docReplicas,
      "winnow_pairs" -> docReplicas,
      "ann_lsh_top5" -> docReplicas,
      // prefix-filter join: candidate buckets are bounded by shingle
      // df; the digit-only true-dup replicas are the worst case (26
      // identical docs share every shingle)
      "dedup_prefix" -> docReplicas,
      // CC + per-cluster arg-max: same shuffle keys as dedup_clusters
      "dedup_canonical" -> docReplicas,
      // explode-only flatMap: the no-shuffle baseline shape
      "doc_chunks" -> docReplicas,
      "q14_sessionize" -> evReplicas)

    def timed(name: String, dir: String): (Double, Long) = {
      meter.reset()
      val t0 = System.nanoTime()
      queries.Queries.all(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = meter.read()
      spark.catalog.clearCache()
      (sec, bytes)
    }

    // JIT/codegen warmup on the same data the timed runs read, so the
    // timed small run measures the operator, not compilation
    ops.foreach { case (name, _) => timed(name, sfDir) }

    val results = ops.map { case (name, r) =>
      val (tSmall, bSmall) = timed(name, sfDir)
      val (tBig, bBig) = timed(name, outDir)
      // floors: sub-second small runs and KB-scale shuffles are
      // overhead-dominated — compare against max(measured, floor)
      val timeRatio = tBig / math.max(tSmall, 0.3)
      val byteRatio = bBig.toDouble / math.max(bSmall.toDouble, 1e6)
      require(timeRatio <= r * slack,
        f"$name wall-time scaled ${timeRatio}%.1fx for ${r}x rows (limit ${r * slack})")
      require(byteRatio <= r * slack,
        f"$name shuffle bytes scaled ${byteRatio}%.1fx for ${r}x rows (limit ${r * slack})")
      // Locale.ROOT: the f-interpolator is locale-sensitive — a
      // comma-decimal default locale would emit invalid JSON
      name -> String.format(java.util.Locale.ROOT,
        """{"rows_x":%d,"small_s":%.3f,"big_s":%.3f,"time_x":%.2f,"small_shuffle_mb":%.1f,"big_shuffle_mb":%.1f,"shuffle_x":%.2f}""",
        Int.box(r), Double.box(tSmall), Double.box(tBig), Double.box(timeRatio),
        Double.box(bSmall / 1e6), Double.box(bBig / 1e6), Double.box(byteRatio))
    }

    val body = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sfEsc = sfDir.replace("\\", "\\\\").replace("\"", "\\\"")
    println(s"""{"metric":"stress","sf_small":"$sfEsc","docs_x":$docReplicas,"events_x":$evReplicas,"slack":$slack,"ops":$body}""")
    spark.stop()
  }
}
