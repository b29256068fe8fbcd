package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The composed training-corpus cleaning pass — the flagship
  * LLM-data-pipeline use case, built entirely from the
  * individually-verified operators:
  *
  *   1. exact dedup: keep the min doc id per content fingerprint
  *      (one shuffle on the 128-bit key);
  *   2. near-dup removal: drop every doc that MinHash-pairs with a
  *      lower-id doc (LSH band join, exact-Jaccard verified);
  *   3. quality gate: codegen'd per-row heuristics, no shuffle.
  *
  * One declarative plan end to end: Catalyst fuses the quality gate
  * into the scan, and the two dedup joins reuse the same shingle
  * cache. At 100 TB the cost profile is dedup's two keyed shuffles —
  * the text-metric stages ride along for free.
  */
object CorpusPipeline {

  def clean(docs: DataFrame, minQuality: Double = 0.5,
            nearDupThreshold: Double = 0.7): DataFrame = {
    val exactKept = Dedup.exact(docs).select("doc_id")
    val nearDupLosers = Dedup.minhashPairs(docs, nearDupThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    docs
      .join(exactKept, "doc_id")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
  }

  /** [[clean]] with CLUSTER-faithful near-dup semantics: instead of
    * greedily dropping any doc that pairs with a lower id (which can
    * orphan a~b~c chains where a!~c), compute connected components
    * over the verified pair graph ([[Dedup.nearDupClusters]]) and
    * keep exactly the min-id doc of each component.
    *
    * The component min is always kept by exact dedup too (its exact-
    * dup group — Jaccard 1 pairs — is a subset of its component, so
    * the component min is also its fingerprint group's min), which
    * makes the two keep-sets compose cleanly.
    */
  def cleanClustered(docs: DataFrame, minQuality: Double = 0.5,
                     nearDupThreshold: Double = 0.7): DataFrame = {
    val exactKept = Dedup.exact(docs).select("doc_id")
    val clusterKeepers = Dedup.nearDupClusters(docs, nearDupThreshold)
      .filter(col("doc_id") === col("cluster_id"))
      .select("doc_id")
    docs
      .join(exactKept, "doc_id")
      .join(clusterKeepers, "doc_id")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
  }

  /** The DAILY-INCREMENT admission pass — [[clean]]'s counterpart
    * for a corpus maintained through a persisted
    * [[MinHashIndex]]: a new batch is admitted doc-by-doc iff it
    * survives
    *
    *   1. the corpus probe: no VERIFIED near-dup (exact Jaccard ≥
    *      threshold) among the indexed documents — corpus-side
    *      work is a SCAN of the stored band/signature tables, never
    *      a re-run of the corpus self-join (the whole point of the
    *      index at 100 TB);
    *   2. intra-batch exact dedup (min id per content fingerprint)
    *      and intra-batch near-dup removal (drop docs pairing with
    *      a lower batch id) — increment-sized self-joins;
    *   3. the quality gate (codegen'd, fused into the scan).
    *
    * Known hole, by declared semantics: a batch doc that is an
    * exact copy of a CORPUS doc is caught by step 1 (identical
    * shingle sets verify at Jaccard 1) only when it has ≥ 3
    * tokens — shingle-less docs carry no near-dup signal, and a
    * short doc can still pass the quality gate (e.g. two stopwords
    * scores ≈ 0.6), so exact copies of sub-shingle corpus docs ARE
    * admitted. Callers that must close it keep a fingerprint table
    * beside the index and anti-join it, exactly like the
    * intra-batch [[Dedup.exact]] step here.
    *
    * The admitted survivors are exactly what [[MinHashIndex.append]]
    * expects back into the index — together they form the
    * probe → admit → append daily cycle.
    */
  def admitIncrement(index: MinHashIndex.Index, batch: DataFrame,
                     minQuality: Double = 0.5,
                     nearDupThreshold: Double = 0.7): DataFrame = {
    // bare keyed projections feed anti joins, whose semantics ignore
    // right-side duplicates — no distinct needed (review-caught: the
    // aggregations only added exchanges to the admission plan)
    val corpusDups = MinHashIndex.probe(index, batch, nearDupThreshold)
      .select(col("batch_id").as("doc_id"))
    val exactKept = Dedup.exact(batch).select("doc_id")
    val batchLosers = Dedup.minhashPairs(batch, nearDupThreshold)
      .select(col("id_b").as("doc_id"))
    batch
      .join(exactKept, "doc_id")
      .join(batchLosers, Seq("doc_id"), "left_anti")
      .join(corpusDups, Seq("doc_id"), "left_anti")
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
  }
}
