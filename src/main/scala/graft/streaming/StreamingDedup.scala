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
  *    PROBABILISTIC ingest gate — single-band, no Jaccard verify, so
  *    recall and precision are both approximate by design; the
  *    verified multi-band batch pass ([[Dedup.minhashPairs]] /
  *    [[Dedup.nearDupClusters]]) remains the authority for
  *    corpus-level dedup. Shingle-less docs (no tokens) fall back to
  *    the exact key — a NULL signature must not funnel every empty
  *    doc into one bucket as phantom dups of each other.
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
      .otherwise(concat_ws("_", sig))
  }

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
}
