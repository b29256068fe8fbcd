package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming document dedup — the LLM-pipeline analog of the
  * reference's drop-at-ingest gate (`MessageProcessor.kt:36-52`
  * diverts malformed payloads before they reach the sink; here,
  * duplicate documents are dropped in the micro-batch path before
  * they reach the corpus).
  *
  * Both gates compose [[KeyedState.dedupeByKey]] (checkpointed
  * per-key state, TTL-bounded, RocksDB-backed in production configs)
  * with a content fingerprint computed by the SAME native
  * expressions as the batch dedup operators — so streaming and batch
  * decisions agree bit-for-bit on identical content:
  *
  *  - [[dedupeExact]]: state key = the md5 content fingerprint
  *    ([[graft.functions.TextFunctions.fingerprintMd5]]) — exact
  *    dedup, the streaming twin of [[Dedup.exact]].
  *  - [[nearDupGate]]: state key = ONE LSH band signature
  *    (`bandRows` MinHash values over 3-token shingles, the same
  *    `ShingleHashes`/`MinHashSignature` pipeline as
  *    [[Dedup.minhashPairs]]). Two docs share the key with
  *    probability J^bandRows (J = shingle Jaccard): a J=0.95
  *    template-spam near-dup collides with p≈0.81 at the default
  *    bandRows=4, an unrelated J=0.2 pair with p≈0.0016. This is a
  *    PROBABILISTIC ingest gate — no Jaccard verify, so recall and
  *    precision are both approximate by design; the verified
  *    multi-band batch pass ([[Dedup.minhashPairs]] /
  *    [[Dedup.nearDupClusters]]) remains the authority for
  *    corpus-level dedup. Shingle-less docs (no tokens) fall back to
  *    the exact key — a NULL signature must not funnel every empty
  *    doc into one bucket as phantom dups of each other.
  *  - [[nearDupGateMulti]]: the recall dial — `bands` chained
  *    per-band gates (admit iff NO band hits), catch probability
  *    1 − (1 − J^bandRows)^bands ≈ 0.9987 at the defaults for
  *    J = 0.95 (measured 1.00 vs the batch authority in
  *    StreamingDedupSpec, single-band 0.83).
  *
  * Delivery semantics: state is checkpointed WITH the query, so an
  * at-least-once source replay after a crash re-enters the
  * transition with the rolled-back state and reaches the same
  * admit/drop decisions — and a duplicate delivery of an
  * already-admitted doc is dropped by the very state that admitted
  * it. Dedup is idempotent, which makes at-least-once delivery look
  * exactly-once at the sink (proven in StreamingDedupSpec).
  *
  * Scale shape: one narrow scan computes the key (codegen'd native
  * expressions, no shuffle), then ONE hash shuffle on the state key —
  * the same key-bounded partitioning as the batch dedup shuffle; no
  * pair joins, no driver-side state.
  */
object StreamingDedup {

  /** A document with its precomputed gate key (the groupByKey field —
    * computed column-side so the codegen'd expressions do the work,
    * not a per-row Scala closure).
    */
  case class KeyedDoc(doc_id: Long, text: String, gate_key: String)

  /** md5 content fingerprint column — identical to [[Dedup.exact]]'s. */
  def exactKey(text: Column): Column =
    graft.functions.TextFunctions.fingerprintMd5(text)

  /** One LSH band signature as a string key: `bandRows` MinHash
    * values over 3-token shingle hashes, `_`-joined; exact-key
    * fallback for shingle-less docs (NULL signature).
    */
  def nearDupKey(text: Column, bandRows: Int = 4): Column = {
    val sig = org.apache.spark.sql.graft.MinHashSignature(
      org.apache.spark.sql.graft.ShingleHashes(text, 3), bandRows)
    when(sig.isNull, exactKey(text))
      .otherwise(Dedup.bandKey(sig, bandRows, 0))
  }

  /** ALL `bands` band keys in one pass: a single
    * `bands × bandRows`-function MinHash signature (the same
    * slice-banding as [[Dedup.minhashPairs]], so band 0 equals
    * [[nearDupKey]] exactly), sliced into `_`-joined per-band keys.
    * Shingle-less docs fall back to the exact key REPEATED per band —
    * every gate stage then sees the same (exact) key, which keeps the
    * multi-band gate's fallback semantics identical to single-band.
    */
  def nearDupKeys(text: Column, bands: Int, bandRows: Int = 4): Column = {
    val sig = org.apache.spark.sql.graft.MinHashSignature(
      org.apache.spark.sql.graft.ShingleHashes(text, 3), bands * bandRows)
    when(sig.isNull, array_repeat(exactKey(text), bands))
      .otherwise(array((0 until bands).map(b =>
        Dedup.bandKey(sig, bandRows, b)): _*))
  }

  /** A document carrying its full per-band key vector through the
    * gate chain (computed ONCE, column-side — the chain re-keys by
    * index instead of re-hashing the text at every stage).
    */
  case class MultiKeyedDoc(doc_id: Long, text: String, keys: Seq[String])

  private def gate(docs: DataFrame, key: Column, ttlMs: Long,
                   idCol: String, textCol: String): Dataset[KeyedDoc] = {
    import docs.sparkSession.implicits._
    val keyed = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"), key.as("gate_key"))
      .as[KeyedDoc]
    KeyedState.dedupeByKey[KeyedDoc](keyed, _.gate_key, ttlMs)
  }

  /** First-seen-wins EXACT dedup in the micro-batch path. */
  def dedupeExact(docs: DataFrame, ttlMs: Long = 0L,
                  idCol: String = "doc_id", textCol: String = "text"): Dataset[KeyedDoc] =
    gate(docs, exactKey(col(textCol)), ttlMs, idCol, textCol)

  /** First-seen-wins NEAR-DUP gate (single-band LSH key; see the
    * object doc for the probabilistic contract).
    */
  def nearDupGate(docs: DataFrame, bandRows: Int = 4, ttlMs: Long = 0L,
                  idCol: String = "doc_id", textCol: String = "text"): Dataset[KeyedDoc] =
    gate(docs, nearDupKey(col(textCol), bandRows), ttlMs, idCol, textCol)

  /** Multi-band NEAR-DUP gate: admit iff NO band key has been seen —
    * the single-band gate's recall dial. A J-similar pair collides on
    * one band with p = J^bandRows, so the gate's catch probability is
    * 1 − (1 − J^bandRows)^bands: at J = 0.95, r = 4, the default
    * b = 4 lifts catch from ≈ 0.81 (single-band — 1 in 5 template
    * spams slipped through at ingest) to ≈ 0.9987.
    *
    * Mechanics: `bands` chained [[KeyedState.dedupeByKey]] stages,
    * stage i keyed by band-i's signature ([[nearDupKeys]], computed
    * once). A doc is admitted iff it survives every stage, i.e. iff
    * no band key was previously claimed — and each SURVIVING stage
    * claims that band's key as it passes. State rows ≈ docs × bands,
    * the linear cost of the recall lift. Chained stateful operators
    * are append-mode streamable (each stage has its own checkpointed
    * state; probed green on this Spark).
    *
    * Claim semantics (deliberate, documented): a doc dropped at
    * stage i has already claimed its band keys for stages < i, so a
    * later doc colliding with a DROPPED doc's earlier band can be
    * dropped too. That is LSH chain-clustering — the same transitive
    * semantics as the batch near-dup components
    * ([[Dedup.nearDupClusters]]), where "near-dup of a near-dup"
    * joins the cluster. The verified batch pass remains the
    * corpus-level authority.
    *
    * Replay safety: all stage states checkpoint with the one query,
    * so an at-least-once replay re-enters every stage with the
    * rolled-back states and reproduces the same admit/drop decisions
    * (StreamingDedupSpec proves redelivery suppression end-to-end).
    *
    * Output gate_key = the `|`-joined full band-key vector (all the
    * gate's state keys, in stage order).
    */
  def nearDupGateMulti(docs: DataFrame, bands: Int = 4, bandRows: Int = 4,
                       ttlMs: Long = 0L, idCol: String = "doc_id",
                       textCol: String = "text"): Dataset[KeyedDoc] = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    import docs.sparkSession.implicits._
    val keyed = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"),
        nearDupKeys(col(textCol), bands, bandRows).as("keys"))
      .as[MultiKeyedDoc]
    val gated = (0 until bands).foldLeft(keyed) { (ds, band) =>
      KeyedState.dedupeByKey[MultiKeyedDoc](ds, _.keys(band), ttlMs)
    }
    gated.map(d => KeyedDoc(d.doc_id, d.text, d.keys.mkString("|")))
  }

  /** A streaming doc joined against the corpus index: one row per
    * (doc × band-probe), `hit` = this band found a VERIFIED corpus
    * near-dup.
    */
  case class ProbeRow(doc_id: Long, text: String, hit: Boolean)

  /** Admission gate against a PERSISTED corpus index
    * ([[graft.operators.MinHashIndex]]) — the stream-static
    * composition: micro-batch docs band with the index's stored
    * params ([[graft.operators.MinHashIndex.bandKeysFor]]), band
    * hits join the static signature table, and a doc is dropped iff
    * some hit VERIFIES at exact Jaccard ≥ `threshold` — unlike the
    * intra-stream gates above, this gate is verified, because the
    * corpus side is large: at corpus scale SOME band-key collision
    * exists for almost every novel doc, so an unverified drop rule
    * would reject a growing fraction of genuinely new documents as
    * the index grows.
    *
    * Mechanics: two branches of the same micro-batch union before a
    * per-doc verdict fold. The CARRIER branch is one row per doc and
    * is the only place the document text travels. The PROBE branch
    * explodes to (doc_id, shingle hashes, band, key) — the text
    * never rides the ×bands explode (review-caught: it multiplied
    * the per-doc payload by the band count) — and takes two
    * stream-static INNER joins (static side on the right — the
    * supported direction), so non-colliding probe rows die at the
    * band join and the corpus tables are only ever SCANNED, holding
    * NO streaming state. The verdict is a stateless
    * `flatMapGroupsWithState` pass (state type `Long`, never set —
    * the operator is used as a per-batch group-by, which append-mode
    * streaming otherwise disallows): admit the carrier iff no probe
    * row verified. Intra-stream duplicates are the other gates' job:
    * compose `corpusGate(nearDupGateMulti(...))` for both directions.
    *
    * Per-trigger cost: one scan of the corpus band table per
    * micro-batch (the stream side is tiny; with AQE the join builds
    * its hash side from the batch). For a corpus that fits the
    * cluster's storage-memory budget, `index.banded.cache()` /
    * `index.signatures.cache()` before attaching the gate pins the
    * static side across triggers — Spark reuses cached static
    * relations in stream-static joins. Shingle-less docs carry no
    * near-dup signal and are ADMITTED (their NULL signature bands to
    * keys no indexed doc has, so only their carrier row survives),
    * mirroring [[graft.operators.MinHashIndex.probe]] which drops
    * them from the pair report.
    */
  def corpusGate(docs: DataFrame, index: graft.operators.MinHashIndex.Index,
                 threshold: Double = 0.7, idCol: String = "doc_id",
                 textCol: String = "text"): Dataset[KeyedDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val carrier = docs.select(
      col(idCol).cast("long").as("doc_id"), col(textCol).as("text"),
      lit(false).as("hit"))
    val hits = docs
      .select(col(idCol).cast("long").as("doc_id"),
        org.apache.spark.sql.graft.ShingleHashes(col(textCol), index.shingleN).as("hs_b"),
        explode(graft.operators.MinHashIndex.bandKeysFor(col(textCol), index)).as("bk"))
      .select(col("doc_id"), col("hs_b"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .join(index.banded.withColumnRenamed("id", "corpus_id"), Seq("band", "key"))
      .join(index.signatures.select(col("id").as("corpus_id"), col("hs").as("hs_c")),
        Seq("corpus_id"))
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        (size(array_intersect(col("hs_b"), col("hs_c"))).cast("double") /
          size(array_union(col("hs_b"), col("hs_c"))).cast("double") >= threshold)
          .as("hit"))
    carrier.unionByName(hits).as[ProbeRow]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[Long, KeyedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[ProbeRow], _) =>
          val buf = rows.toSeq
          if (buf.exists(_.hit)) Iterator.empty
          else buf.collectFirst { case r if r.text != null =>
            KeyedDoc(r.doc_id, r.text, "corpus") }.iterator
      }
  }
}
