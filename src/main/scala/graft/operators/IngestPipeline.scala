package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline's dataflow operators, re-expressed as
  * declarative Spark transforms.
  *
  * Reference behavior being reproduced (SURVEY.md §2):
  *  - F3/F4: empty-body and JSON-validity admission filters
  *    (`publisher/internal/api/handler.go:67-78`)
  *  - F5/F6: per-record parse-failure drop, PERMISSIVE decode
  *    (`consumer/.../ClickHouseWriterService.kt:78-87`,
  *    `consumer2/.../MessageProcessor.kt:36-52`)
  *  - F1/F2/S5: API-key validation as a semi-join against the auth
  *    dimension (`publisher/internal/auth/auth.go:33-59`)
  *  - P1/P2: fixed projection in declared order with missing→null
  *    (`consumer/.../ClickHouseWriterService.kt:53-56,107-119`)
  *  - P3: ingest-time enrichment column
  *    (`consumer2/.../ClickHouseRepository.kt:75`)
  *  - P4: raw-payload retention (`consumer/clickhouse/init-db.sh:28`)
  *
  * Every operator is a pure `DataFrame => DataFrame` so the same code
  * runs in batch and inside a Structured Streaming micro-batch
  * (graft.streaming.IngestStream). All filters are Catalyst
  * predicates — they push down to the source scan; the auth join
  * broadcasts the (small) key dimension so validation never shuffles
  * the event stream, which is the property that holds at 100 TB.
  */
object IngestPipeline {

  /** Payload schema of the driver testdata's `events.props` column:
    * {"k": int}. Production payloads pass their own schema.
    */
  val payloadSchema: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = true)))

  val corruptCol = "_corrupt_record"

  /** PERMISSIVE parse with explicit corrupt-record routing.
    *
    * Corruption — the union of the reference's `json.Valid` strict
    * check (`handler.go:74-78`) and the typed-decode object
    * requirement (`MessageProcessor.kt:64-71`) — is decided by ONE
    * native byte-level pass,
    * [[graft.functions.GraftFunctions.jsonIsValidObject]]:
    * strict whole-string validity (Jackson, and hence `from_json`,
    * ACCEPTS trailing garbage like `{"a":1}x` that Go rejects) AND a
    * top-level object (a struct-schema decode of `42`/`[1]` has no
    * fields to bind). That predicate is exactly the complement of
    * "from_json would mark this row corrupt ∨ strict validity
    * fails", so no `from_json` appears in the corrupt flag at all.
    *
    * WHY THIS SHAPE (r9, the q6 hot path): the previous form derived
    * the flag from `from_json`'s corrupt pseudo-field plus a
    * `json_is_valid` conjunct. Filter pushdown then inlined that
    * whole expression into the admission filter, leaving TWO
    * `from_json` copies in the optimized plan — for an admitted row,
    * Jackson ran three times (corrupt probe + strict check + field
    * decode). Now the admission filter costs one streaming byte pass
    * and the single remaining `from_json` decodes fields AFTER the
    * filter, so rejected rows never pay a typed decode (measured at
    * sf0.1: q6 1.33 s → see BENCH; Q6Probe counts the copies).
    *
    * The [[corruptCol]] lands top-level holding the raw payload iff
    * the row is malformed (DLQ retention). Semantics note vs the old
    * form: a valid OBJECT whose field has the wrong JSON type (e.g.
    * `{"k": {"a": 1}}`) is now ADMITTED with that field null —
    * PERMISSIVE semantics, and what the DuckDB oracle's
    * `TRY_CAST(props->>k)` always did; the old corrupt-pseudo-field
    * path rejected it (divergence was documented on q6, now gone).
    */
  def parse(raw: DataFrame, jsonCol: String = "props",
            schema: StructType = payloadSchema): DataFrame =
    raw
      .withColumn(corruptCol,
        when(col(jsonCol).isNotNull &&
          !graft.functions.GraftFunctions.jsonIsValidObject(col(jsonCol)),
          col(jsonCol)))
      .withColumn("parsed", from_json(col(jsonCol), schema))

  /** F3 + F4: admission filter — non-null, non-empty, well-formed
    * JSON. (The reference returns 400 for both; here the rows simply
    * do not enter the accepted stream.)
    */
  def admitted(parsed: DataFrame, jsonCol: String = "props"): DataFrame =
    parsed.filter(
      col(jsonCol).isNotNull &&
      length(col(jsonCol)) > 0 &&
      col(corruptCol).isNull)

  /** F6/D3: the DLQ side — malformed, empty, or null payloads. */
  def rejectedMalformed(parsed: DataFrame, jsonCol: String = "props"): DataFrame =
    parsed.filter(
      col(jsonCol).isNull ||
      length(col(jsonCol)) === 0 ||
      col(corruptCol).isNotNull)

  /** F1/F2/S5: API-key validation as a broadcast left-semi join.
    * `keys` is the auth dimension (one row per active key). Broadcast
    * is explicit: the dimension is small (≤ millions of keys) and the
    * stream is huge, so the stream side must never shuffle.
    */
  def validated(events: DataFrame, keys: DataFrame, keyCol: String = "user_id"): DataFrame =
    events.join(broadcast(keys), col(keyCol) === keys("api_key"), "left_semi")

  /** The 401 path: events whose key is missing or not active. */
  def rejectedAuth(events: DataFrame, keys: DataFrame, keyCol: String = "user_id"): DataFrame =
    events.join(broadcast(keys), col(keyCol) === keys("api_key"), "left_anti")

  /** P1/P2/P3/P4: fixed projection in declared order (missing keys →
    * null), ingest-time enrichment, raw-payload retention.
    *
    * `receivedAt` is injectable for deterministic tests (the
    * reference stamps wall-clock at insert, which is
    * nondeterministic — SURVEY.md §7.4); pass None for
    * `current_timestamp()` in production.
    */
  def enriched(parsed: DataFrame, receivedAt: Option[Column] = None,
               jsonCol: String = "props"): DataFrame =
    parsed.select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      col("value"),
      col("parsed.k").as("k"),
      // same jsonCol parameter as parse/admitted — a hardcoded
      // "props" here broke the composed pipeline for any other
      // payload column (review-caught)
      col(jsonCol).as("_raw_data"),
      receivedAt.getOrElse(current_timestamp()).as("received_at"))

  /** The full accepted-path DAG: parse → admit → auth → project.
    * One declarative plan; Catalyst orders the cheap predicates first
    * and pushes them into the scan.
    */
  def accepted(events: DataFrame, keys: DataFrame,
               receivedAt: Option[Column] = None,
               jsonCol: String = "props"): DataFrame =
    enriched(
      admitted(validated(parse(events, jsonCol), keys), jsonCol),
      receivedAt, jsonCol)
}
