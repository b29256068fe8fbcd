package graft

import org.apache.spark.sql.SparkSession

/** Session tuning applied by every entry point (Verify, Bench, tests,
  * and defensively inside each registered query, since the driver may
  * hand us a session it built itself).
  *
  * All of these are dynamic SQLConf keys, so setting them repeatedly
  * on a live session is safe and idempotent.
  */
object GraftSession {

  /** Apply graft's required runtime confs to an existing session.
    *
    *  - `nanosAsLong`: the driver-generated `events.parquet` carries
    *    TIMESTAMP(NANOS) which Spark 4.x refuses to read as a
    *    timestamp ([PARQUET_TYPE_ILLEGAL]); this legacy flag surfaces
    *    it as a plain nanos-since-epoch LongType, which we expose as
    *    `ts_ns` (see [[graft.tables.Tables.eventsNorm]]).
    *  - UTC session timezone: deterministic timestamp rendering vs
    *    the DuckDB oracle.
    *  - AQE on: runtime coalescing + skew-join handling — the
    *    behavior we want on a real cluster, exercised in tests too.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // AQE rewrites a planned sort-merge join to a shuffled-hash join
    // when EVERY post-shuffle partition of the build side measures
    // under this cap (optimization guide §3.1) — skips both sort
    // passes (table_diff's full-outer, the dedup anti-joins). Runtime
    // decision on measured bytes, so scale-safe: an over-cap partition
    // keeps the spilling sort-merge path. 64 MiB ≈ the default
    // advisory partition size, far under executor task memory.
    spark.conf.set(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
    // SQL names for graft's native expressions (json_is_valid,
    // simhash64, cosine_similarity, ...) — idempotent
    org.apache.spark.sql.graft.GraftSqlFunctions.register(spark)
    // optimizer rules (collapse idempotent normalize/canonicalize
    // chains) — idempotent
    org.apache.spark.sql.graft.GraftOptimizations.register(spark)
    spark
  }

  /** Build a local session for harness mains (Verify/Bench). Shuffle
    * partitions sized to the local core count, not the 200 default —
    * at sf0.1 on local[32] that keeps every partition comfortably in
    * memory; on a real cluster this would be set per-job.
    */
  def build(master: String, shufflePartitions: String): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      // analyzer-level extensions (SQL UPDATE/MERGE on snapshot
      // tables resolve through a post-hoc rule — analyzer rules,
      // unlike functions/optimizer rules, cannot be injected into a
      // live session, so they ride the builder)
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // see tune(): runtime SMJ -> shuffled-hash rewrite on measured
      // per-partition bytes (guide §3.1)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.ui.enabled", "false")
      // the default 100-entry generated-class cache thrashes once the
      // 83-query harness is in play (every eviction = a full Janino
      // recompile on the next run of that plan — benched as a stable
      // 2-6x slowdown on whichever scan queries lost the lottery)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
