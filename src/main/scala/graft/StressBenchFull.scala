package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Full-surface scale stress: every registered query runs once on
  * sf0.1 and once on the scaled copy ([[StressBench]]'s replica
  * builders: documents/embeddings ×26, events ×100, TPC-H tables
  * byte-identical). Purpose: the per-query medians at sf0.1 are all
  * sub-3 s and overhead-dominated, so a plan pathology (accidental
  * cross join, payload-carrying explode, a window that collapses to
  * one partition) only becomes visible against the scaled tables —
  * this catches it for the LONG TAIL of the surface, not just the
  * ten known-heavy ops.
  *
  * Each query's expected row ratio is detected from its OWN plan:
  * the max scale factor over the parquet scans it performs
  * (documents/embeddings → docs_x, events → events_x, anything else
  * → 1). A query over unscaled tables therefore asserts time_x ≤
  * slack — a pure regression guard. Wall-time ratios compare against
  * `max(small, 0.3 s)` so overhead-dominated sub-second queries
  * don't divide by noise.
  *
  * For the pair-join family (dedup/similarity — the ops whose
  * failure mode is a quadratic candidate blowup that 32-way
  * parallelism can hide inside a wall-time budget), shuffled BYTES
  * are metered in dedicated runs with auto-broadcast disabled at
  * both scales (see `meteredBytes` — like-for-like plan shapes) and
  * asserted against the same `rows_x × slack` limit, mirroring
  * [[StressBench]]'s per-op meter across the full surface.
  *
  * Per-query failures (OOM at scale, checkpoint-block loss) are
  * recorded as sentinel rows (`ok:false`, times −1) and the sweep
  * continues — the artifact is ALWAYS written; the final `require`
  * that fails the run comes after the write, so the numbers that
  * show the failure survive it.
  *
  * Prints one JSON line and writes it to BENCH_STRESS_FULL.json
  * (capture-proof, same policy as Bench).
  */
object StressBenchFull {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_STRESS_DIR", "target/stress_full")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val docReplicas = sys.env.getOrElse("SPARK_GRAFT_STRESS_DOCS_X", "26").toInt
    val evReplicas = sys.env.getOrElse("SPARK_GRAFT_STRESS_EVENTS_X", "100").toInt
    val slack = 3.0
    val spark = GraftSession.build(s"local[$cpus]", cpus)
    GraftSession.tune(spark)
    val meter = new org.apache.spark.graft.ShuffleBytesListener(spark.sparkContext)

    // --- scaled + pass-through tables (not timed) ------------------
    StressBench.buildScaledTables(spark, sfDir, outDir, docReplicas, evReplicas,
      copyUnscaled = true)

    // Queries whose builders EAGERLY materialize via localCheckpoint
    // (the CC family, q33, and the single-scan event rewrites q30/q43)
    // return a plan rooted at a LogicalRDD — the file scans are
    // truncated away, so plan-based detection can't see them. Their
    // dominant table is declared here instead.
    val ratioOverrides: Map[String, Int] = Map(
      "dedup_clusters" -> docReplicas,
      "dedup_canonical" -> docReplicas,
      "corpus_clean_cc" -> docReplicas,
      "q30_gap_fill" -> evReplicas,
      "q42_spend_quartiles" -> evReplicas,
      "q43_moving_avg" -> evReplicas,
      "q33_monthly_delta" -> 1, // orders — unscaled
      // r10: both build scratch tables from the scaled sources and
      // return plans reading the SCRATCH paths — plan-based detection
      // sees neither documents.parquet nor events.parquet
      "snapshot_diff" -> docReplicas,
      // r14: same scratch-lineage shape as snapshot_diff (commit →
      // rename → clustered compact over the scaled documents, read
      // through the pruned manifest)
      "snapshot_pruned_read" -> docReplicas,
      "snapshot_cow_dml" -> docReplicas,
      // r15: same scratch shape — the lakehouse stream loop and the
      // COW merge build from the scaled documents (the timed big run
      // includes the ONE-TIME session-scratch build: the ×26 stream /
      // merge itself, which is exactly the linear work the gate
      // should budget at docReplicas)
      "snapshot_stream_read" -> docReplicas,
      "snapshot_merge" -> docReplicas,
      "snapshot_time_partitioned" -> evReplicas,
      // r16: scratch lineages over the scaled documents whose TIMED
      // body scans the full ×26 table back (the DV-filtered read /
      // the SQL read of the inserted table). snapshot_sql_read and
      // snapshot_sql_travel stay UN-overridden on purpose: their
      // fixed-range predicates prune to a bounded file set, so
      // near-constant time at ×26 is exactly the law the gate should
      // hold them to (r = 1).
      "snapshot_dv_delete" -> docReplicas,
      "snapshot_sql_insert" -> docReplicas,
      "snapshot_sql_delete" -> docReplicas,
      // r17: same scratch shape — the timed big run pays the ONE-TIME
      // ×26 lineage build (full-corpus INSERT, then the whole-table
      // UPDATE / full-key-range MERGE / modulo DV deletes / ALTER
      // lineage), all linear in the corpus — exactly the docReplicas
      // budget. The REGISTERED reads stay bounded (snapshot_sql_read /
      // _travel remain un-overridden as the r=1 pruning law)
      "snapshot_sql_update" -> docReplicas,
      "snapshot_sql_merge" -> docReplicas,
      "snapshot_sql_dv_read" -> docReplicas,
      "snapshot_sql_alter" -> docReplicas,
      // r18: same scratch shape — the timed big run pays the ×26
      // lineage build (the composite-key RMW merge over the full
      // corpus; the CDF lineage's COW update/delete + full change-feed
      // stream back), linear in the corpus
      "snapshot_sql_merge_multi" -> docReplicas,
      "snapshot_cdf_stream" -> docReplicas,
      "snapshot_cdf_batch" -> docReplicas,
      "delete_by_key" -> evReplicas)

    // Pair-join family: shuffle bytes asserted alongside wall time. A
    // candidate-pair explosion multiplies the (band|fingerprint, id)
    // shuffle payload long before it saturates 32 cores.
    val byteOps: Set[String] = Set(
      "dedup_exact", "dedup_minhash", "dedup_prefix", "dedup_clusters",
      "dedup_canonical", "doc_simhash_pairs", "doc_winnow", "winnow_pairs",
      "corpus_clean", "corpus_clean_cc", "dup_source_matrix",
      "emb_cosine_pairs", "ann_lsh_top5", "knn_top10", "emb_hard_negatives",
      "q38_decontamination", "dedup_incremental", "doc_dup_spans",
      "doc_strip_dup_spans", "corpus_increment",
      // round-9 second wave: every op whose failure mode is a
      // candidate/variant blowup rather than raw wall time
      "fuzzy_join", "doc_line_dedup", "emb_pq_codes", "table_diff",
      "doc_keyword_search", "q51_sequence_match", "ann_adc_top5")

    /** Max scale factor over the parquet tables this query scans
      * (collectWithSubqueries — an EXISTS subquery's scan counts
      * too). Zero scans (literal fixtures, pre-materialized
      * checkpoints) → 1.
      */
    def rowRatio(df: DataFrame): Int = {
      val paths = df.queryExecution.analyzed.collectWithSubqueries {
        case l: LogicalRelation =>
          l.relation match {
            case f: HadoopFsRelation => f.location.rootPaths.map(_.getName)
            case _ => Seq.empty[String]
          }
      }.flatten
      val ratios = paths.map {
        case "documents.parquet" | "embeddings.parquet" => docReplicas
        case "events.parquet" => evReplicas
        case _ => 1
      }
      if (ratios.isEmpty) 1 else ratios.max
    }

    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      queries.Queries.all(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // blocking: eviction I/O must not overlap the next timed window
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      sec
    }

    // Byte-metered runs execute with auto-broadcast DISABLED at BOTH
    // scales: at sf0.1 the pair ops' verify joins broadcast (near-zero
    // shuffle) while at 26× they spill into real shuffles, so a
    // default-config ratio compares two different plan shapes and
    // reads the broadcast→shuffle regime change as a 500× "blowup"
    // (observed on emb_cosine_pairs). Forcing the shuffle plan on both
    // sides makes the ratio measure DATA growth, which is what the
    // quadratic-pair guard is for. Explicit broadcast() hints in
    // operator code are unaffected (hints override the threshold), so
    // deliberately-broadcast dimensions keep their shape. Wall-time
    // assertions stay on the default-config timed runs above.
    def meteredBytes(name: String, dir: String): Long = {
      val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      val saved = keys.map(k => k -> spark.conf.getOption(k))
      keys.foreach(spark.conf.set(_, "-1"))
      try {
        meter.reset()
        queries.Queries.all(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        meter.read()
      } finally {
        saved.foreach { case (k, v) =>
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
    }

    case class Row(name: String, r: Int, tSmall: Double, tBig: Double,
                   bSmall: Long, bBig: Long, metered: Boolean,
                   err: Option[String]) {
      // −1 sentinels on failed rows: a −1/0.3 ratio in the artifact
      // would read as a (negative) garbage number to a driver that
      // sorts/averages time_x without checking ok (review-caught);
      // Bench's convention is that −1 alone marks failure.
      def timeRatio: Double =
        if (err.isDefined) -1.0 else tBig / math.max(tSmall, 0.3)
      // KB-scale shuffles are overhead-dominated — floor at 1 MB
      def byteRatio: Double =
        if (err.isDefined) -1.0 else bBig.toDouble / math.max(bSmall.toDouble, 1e6)
      def ok: Boolean = err.isEmpty && timeRatio <= r * slack &&
        (!metered || byteRatio <= r * slack)
    }

    val results = queries.Queries.all.keys.toSeq.sorted.map { name =>
      // ratio from the small-dir plan (table NAMES decide, so either
      // dir gives the same answer). The builder is constructed for
      // EVERY query — including overridden ones — so the eager
      // builders' first execution (the CC family's checkpoints, IVF's
      // fit) happens here, untimed, and tSmall below isn't inflated
      // by cold codegen/JIT the big run doesn't pay (review-caught).
      val row =
        try {
          val built = queries.Queries.all(name)(spark, sfDir)
          val r = ratioOverrides.getOrElse(name, rowRatio(built))
          val tS = timed(name, sfDir)
          val tB = timed(name, outDir)
          val (bS, bB) =
            if (byteOps(name)) (meteredBytes(name, sfDir), meteredBytes(name, outDir))
            else (0L, 0L)
          Row(name, r, tS, tB, bS, bB, byteOps(name), None)
        } catch { case e: Throwable =>
          // clean up whatever the failed run left pinned before moving on
          try {
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
          } catch { case _: Throwable => () }
          Row(name, ratioOverrides.getOrElse(name, 1), -1, -1, 0, 0,
            byteOps(name), Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      System.err.println(f"[stress-full] ${row.name}%-22s r=${row.r}%3d " +
        f"small=${row.tSmall}%7.2fs big=${row.tBig}%7.2fs x=${row.timeRatio}%6.2f " +
        (if (row.metered) f"bytes_x=${row.byteRatio}%6.2f " else "") +
        (row.err match {
          case Some(m) => s"  <-- FAILED: $m"
          case None => if (row.ok) "" else "  <-- SUPER-LINEAR"
        }))
      row
    }

    def jesc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .flatMap(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString)
    val body = results.map { row =>
      val bytes =
        if (row.metered) String.format(java.util.Locale.ROOT,
          ""","small_shuffle_mb":%.1f,"big_shuffle_mb":%.1f,"shuffle_x":%.2f""",
          Double.box(row.bSmall / 1e6), Double.box(row.bBig / 1e6),
          Double.box(row.byteRatio))
        else ""
      val err = row.err.map(m => s""","err":"${jesc(m.take(160))}"""").getOrElse("")
      "\"" + row.name + "\":" + String.format(java.util.Locale.ROOT,
        """{"rows_x":%d,"small_s":%.3f,"big_s":%.3f,"time_x":%.2f,"ok":%b""",
        Int.box(row.r), Double.box(row.tSmall), Double.box(row.tBig),
        Double.box(row.timeRatio), Boolean.box(row.ok)) + bytes + err + "}"
    }.mkString("{", ",", "}")
    val sfEsc = jesc(sfDir)
    val line =
      s"""{"metric":"stress_full","sf_small":"$sfEsc","docs_x":$docReplicas,"events_x":$evReplicas,"slack":$slack,"bytes_mode":"no_broadcast","n_queries":${results.size},"n_superlinear":${results.count(!_.ok)},"ops":$body}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_STRESS_FULL_OUT", "/root/repo/BENCH_STRESS_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[stress-full] file write failed: ${e.getMessage}") }

    val bad = results.filterNot(_.ok)
    require(bad.isEmpty,
      "stress failures: " + bad.map { r =>
        r.err match {
          case Some(m) => s"${r.name} FAILED ($m)"
          case None =>
            f"${r.name} time ${r.timeRatio}%.1fx" +
              (if (r.metered) f" bytes ${r.byteRatio}%.1fx" else "") +
              f" for ${r.r}x rows (limit ${r.r * slack})"
        }
      }.mkString("; "))
    spark.stop()
  }
}
