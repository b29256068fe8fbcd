package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` so Catalyst's
  * vectorized parquet scan, predicate pushdown, and column pruning
  * apply automatically. At cluster scale the same call works against
  * any distributed FS path; nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // -----------------------------------------------------------------
  // Generation-robust dispatch (the r8 lesson, generalized): the
  // driver regenerates /root/testdata between rounds and has already
  // changed a physical encoding once (events.ts NANOS → MICROS-NTZ,
  // which crashed 26 queries whose failures the driver then silently
  // omitted). These helpers make the loaders themselves validate the
  // SCANNED schema at plan-build time: tolerated generations (integer
  // widening, either float width for embeddings) normalize to one
  // contract, anything novel throws ONE line naming table, column,
  // and type — a red `graft_error` row per query instead of a silent
  // family flip. SchemaDriftSpec pins the same envelope at test time;
  // this is the runtime half that still fires inside the driver's
  // Verify/Bench runs against freshly regenerated parquet.
  // -----------------------------------------------------------------
  import org.apache.spark.sql.types._

  private def scannedType(df: DataFrame, table: String, col: String): DataType =
    df.schema.fields.find(_.name == col).map(_.dataType).getOrElse {
      throw new IllegalStateException(
        s"$table.$col MISSING from scanned parquet schema ${df.schema.simpleString} — driver testdata drifted")
    }

  /** Require the scanned column's type in the tolerated set — loud
    * single-line failure otherwise. */
  private def requireType(df: DataFrame, table: String, col: String,
      ok: Set[DataType]): Unit = {
    val dt = scannedType(df, table, col)
    if (!ok.contains(dt))
      throw new IllegalStateException(
        s"$table.$col has unsupported scanned type $dt (tolerated: ${ok.mkString(", ")}) — driver testdata drifted")
  }

  /** Normalize an id/count column to the LongType contract: int64
    * passes through, int32 (a tolerated regeneration) widens exactly,
    * anything else is loud. */
  private def normLong(df: DataFrame, table: String, colName: String): DataFrame =
    scannedType(df, table, colName) match {
      case LongType => df
      case IntegerType => df.withColumn(colName, col(colName).cast(LongType))
      case other =>
        throw new IllegalStateException(
          s"$table.$colName has unsupported scanned type $other (tolerated: bigint, int) — driver testdata drifted")
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  /** `documents` under the fixed contract (doc_id/n_chars: Long,
    * text/lang/source: String) regardless of which generation the
    * driver wrote — the [[eventsNorm]] pattern applied to this table.
    * Integer ids widen exactly (keeps planted negative-Long fixture
    * ids union-compatible); a string column changing type throws at
    * plan-build time rather than silently flipping a query family.
    */
  def documents(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "documents")
    Seq("text", "lang", "source").foreach(c =>
      requireType(raw, "documents", c, Set(StringType)))
    normLong(normLong(raw, "documents", "doc_id"), "documents", "n_chars")
  }

  /** `embeddings` under the fixed contract (vec_id: Long; embedding:
    * float OR double array — both are exact vs the oracle because
    * every kernel accumulates in double and DuckDB reads the same
    * parquet values; label: int or long, queries cast at output).
    * Novel encodings throw at plan-build time.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "embeddings")
    requireType(raw, "embeddings", "embedding",
      Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
        ArrayType(DoubleType, true), ArrayType(DoubleType, false)))
    requireType(raw, "embeddings", "label", Set(IntegerType, LongType))
    normLong(raw, "embeddings", "vec_id")
  }

  /** The fixture embedding dimension ([[embeddingsFinite]]'s default
    * gate; TESTDATA ships 64-dim vectors and every oracle indexes a
    * fixed `range(1, 65)`). A deployment passes its own model dim.
    */
  val EmbeddingDim = 64

  /** [[embeddings]] restricted to WELL-FORMED vectors: any row whose
    * embedding carries a NaN or ±Infinity component, or whose length
    * differs from the declared model dimension, is dropped. This is
    * the similarity/clustering/quantization universe — at corpus
    * scale, encoder failures DO produce non-finite and truncated
    * vectors, and both engines otherwise diverge on them (Spark and
    * DuckDB each treat NaN as greater-than-everything in their own
    * rankings, DuckDB errors casting NaN to integral types, Spark
    * ML's vector conversion throws outright on NaN and k-means on
    * ragged dims, and a ragged vector makes Spark's posexplode and
    * the oracle's fixed-range indexing count different component
    * sets), so the only portable, sane semantic is exclusion at the
    * table boundary. The norm-audit query
    * ([[graft.queries.Queries.embNorms]]) deliberately reads the RAW
    * table instead and counts corrupt rows — exclusion here is how
    * the rest of the surface stays deterministic, the audit is how
    * corrupt rows stay visible. Scan-side codegen'd predicate; no
    * shuffle, no extra pass.
    */
  def embeddingsFinite(s: SparkSession, d: String,
                       dim: Int = EmbeddingDim): DataFrame =
    // the isNull arm keeps the gate two-valued: without it a NULL
    // component makes `exists` return NULL, which WHERE treats as
    // drop in Spark but DuckDB's list_filter would KEEP (NOT
    // isfinite(NULL) is NULL, not true) — the oracle CTE carries the
    // matching `x IS NULL` arm (review r12)
    embeddings(s, d).filter(size(col("embedding")) === dim &&
      !exists(col("embedding"),
        x => x.isNull || isnan(x) || abs(x) === lit(Double.PositiveInfinity)))

  /** The auth dimension analog of the reference's Postgres `api_keys`
    * table (`publisher/migrations/001_create_api_keys.up.sql:2-9`):
    * a small keyed dimension with an `is_active` predicate. Here the
    * key space is `customer.c_custkey` and "active" is a positive
    * account balance, so the events stream splits into accepted /
    * rejected exactly like the reference's 202/401 paths.
    *
    * Small by construction (one row per key) — always broadcast it.
    */
  def activeKeys(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_acctbal") > 0)
      .select(col("c_custkey").as("api_key"))

  /** `events` with its TIMESTAMP(NANOS) column surfaced portably.
    *
    * Spark 4.x cannot read parquet nano timestamps as TimestampType
    * ([PARQUET_TYPE_ILLEGAL]); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[graft.GraftSession.tune]]) the column arrives as LongType
    * nanos-since-epoch. We expose it as:
    *   - `ts_ns`: the raw nanos long — equals DuckDB's
    *     `epoch_ns(ts)` bit-for-bit, so it is the oracle-portable
    *     representation;
    *   - `ts`: a proper TimestampType truncated to micros
    *     (`timestamp_micros(ts_ns div 1000)`) for event-time
    *     operations (windows, watermarks). Integer division — a
    *     double round-trip would lose precision above 2^53 ns.
    */
  /** Nanos → micros as FLOOR division, matching DuckDB's `epoch_us`.
    * `ts_ns div 1000` alone truncates toward zero, which is 1 µs too
    * HIGH for pre-epoch (negative) timestamps not on a µs boundary
    * (review-caught) — integer-exact at any magnitude, unlike a
    * double round-trip above 2^53 ns.
    */
  val tsUsExpr: String =
    "(ts_ns div 1000) + (CASE WHEN ts_ns % 1000 < 0 THEN -1 ELSE 0 END)"

  /** Floor division of `ts_ns` by an arbitrary bucket width — the
    * same DuckDB `//` parity as [[tsUsExpr]] for the hour/day bucket
    * queries (Spark `div` truncates toward zero, off-by-one for
    * pre-epoch timestamps).
    */
  def tsNsFloorDiv(divisor: Long): String =
    s"((ts_ns div $divisor) + (CASE WHEN ts_ns % $divisor < 0 THEN -1 ELSE 0 END))"

  /** `events` normalized to the (`ts_ns`: Long nanos, `ts`: Timestamp
    * micros) pair regardless of how the parquet writer encoded the
    * column. Two generations of driver testdata exist:
    *  - TIMESTAMP(NANOS), which Spark can only read with
    *    `nanosAsLong=true` → arrives as LongType nanos;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) → arrives as
    *    TimestampNTZType (the legacy nanos flag does not touch
    *    micros).
    * Dispatching on the scanned type keeps every downstream query
    * identical: `ts_ns` always equals DuckDB's `epoch_ns(ts)`
    * bit-for-bit. For the micros generation, the NTZ wall-clock is
    * reinterpreted as an instant under the UTC session timezone
    * ([[graft.GraftSession.tune]]) — exactly how DuckDB treats a
    * naive timestamp in `epoch_ns` — and `unix_micros * 1000` is
    * exact because the low three nano digits are zero in both
    * engines.
    */
  /** Heal single-split input skew (optimization guide §2.5: "one huge
    * unsplittable file ... repartition immediately after the read").
    * The driver testdata ships every table as ONE parquet file with
    * ONE row group, so a scan stage plans as a single task and all
    * per-row compute (decimal aggregation, JSON parsing, regex) runs
    * on one core regardless of `local[N]`. When the planned scan has
    * materially fewer splits than the session's parallelism, insert
    * one deterministic hash repartition on `key` so the compute above
    * it runs on every core.
    *
    * Scale-adaptive by construction, not a local[32] constant: the
    * partition count is the session's `defaultParallelism`, and on a
    * real multi-file layout (a 100 TB table is thousands of splits —
    * `splits >= parallelism/2` holds) this is a NO-OP, so no shuffle
    * is ever added where the scan already parallelizes. Per-query
    * opt-in rather than inside the loaders: queries whose downstream
    * work is a cheap scan-side kernel measurably LOSE from the extra
    * exchange (the round-9 dedup_minhash measurement), so only the
    * compute-bound shapes route through this.
    */
  def parallelizeSingleSplitScan(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans the scan without running a job; its partition count
    // is the split count the scheduler would use
    if (df.rdd.getNumPartitions * 2 <= p) df.repartition(p, key) else df
  }

  def eventsNorm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val raw = events(s, d)
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr(tsUsExpr)))
      case TimestampType | TimestampNTZType =>
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — expected nanos-as-long or timestamp")
    }
  }
}
