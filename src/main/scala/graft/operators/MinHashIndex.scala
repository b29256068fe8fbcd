package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable MinHash+LSH near-duplicate index — the "build once,
  * probe many" lifecycle for TEXT dedup, mirroring [[IvfIndex]] for
  * embeddings. This is the production shape of incremental corpus
  * maintenance: the reference ingests continuously (consumer loop,
  * `consumer/src/main/kotlin/.../IngestionConsumer.kt`), and a
  * training-data pipeline at 100 TB dedups each day's increment
  * against the accumulated corpus rather than re-running the
  * self-join over everything.
  *
  * Index layout (all derived from [[Dedup.minhashPairs]]'s exact
  * machinery, so probe recall matches the self-join's):
  *
  *  - `banded` (band, key, id): one row per (document × band), keyed
  *    by the band's r-row signature slice — the LSH bucket table.
  *  - `signatures` (id, hs): the 64-bit shingle-hash sets, kept for
  *    the exact-Jaccard verify step (md5-free of false positives).
  *  - params (k, bands, shingleN): pinned at build time; probe-side
  *    hashing re-derives the SAME bands from them, and [[load]]
  *    refuses an index whose params row is missing — probing with a
  *    mismatched band layout would silently return zero candidates.
  *
  * 100 TB probe shape: the corpus-sized tables (`banded`,
  * `signatures`) are only ever SCANNED — the day's batch explodes to
  * its own (band, key) rows (increment-sized, broadcast under AQE),
  * the bucket join streams over the stored band table, and the
  * verify joins attach shingle sets to the (few) candidates. No
  * corpus-sized shuffle anywhere; cost is one corpus scan per probe
  * plus work linear in the batch.
  */
object MinHashIndex {

  /** A built or loaded index. `banded`/`signatures` are ordinary
    * DataFrames (parquet-backed after [[load]]), so Catalyst prunes
    * and pushes down into them like any table.
    */
  case class Index(banded: DataFrame, signatures: DataFrame,
                   k: Int, bands: Int, shingleN: Int)

  /** Build the index over a corpus: one narrow pass computes the
    * shingle-hash set and k-wide signature per document
    * (codegen'd — [[org.apache.spark.sql.graft.ShingleHashes]] /
    * [[org.apache.spark.sql.graft.MinHashSignature]]), then the
    * band explode. Shingle-less documents (< shingleN tokens) carry
    * no signal and are excluded, exactly as in
    * [[Dedup.minhashPairs]].
    */
  def build(corpus: DataFrame, k: Int = 48, bands: Int = 16,
            shingleN: Int = 3, textCol: String = "text",
            idCol: String = "doc_id"): Index = {
    require(k % bands == 0, "k must be a multiple of bands")
    val signatures = corpus
      .select(col(idCol).as("id"),
        org.apache.spark.sql.graft.ShingleHashes(col(textCol), shingleN).as("hs"))
      .filter(size(col("hs")) > 0)
    val banded = signatures
      .withColumn("sig", Dedup.signatureFromHashes(col("hs"), k))
      .select(col("id"), explode(Dedup.bandArray(col("sig"), k, bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("id"))
    Index(banded, signatures, k, bands, shingleN)
  }

  /** Persist under `path/{banded,signatures,params}`. The band table
    * is the probe-side scan target; the signature table feeds the
    * verify join. Params ride as a one-row table (one footer).
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.banded.sparkSession
    import spark.implicits._
    index.banded.write.mode("overwrite").parquet(s"$path/banded")
    index.signatures.write.mode("overwrite").parquet(s"$path/signatures")
    Seq((index.k, index.bands, index.shingleN))
      .toDF("k", "bands", "shingle_n")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
  }

  /** Load a [[save]]d index. Fails loudly on a missing/ambiguous
    * params row — band-layout params are the contract that makes a
    * probe's bucket keys comparable to the stored ones.
    */
  def load(spark: SparkSession, path: String): Index = {
    val params = spark.read.parquet(s"$path/params")
      .select(col("k").cast("int"), col("bands").cast("int"),
        col("shingle_n").cast("int"))
      .collect()
    require(params.length == 1,
      s"corrupt MinHash index at $path: expected exactly one params row, " +
        s"got ${params.length}")
    val p = params(0)
    Index(
      banded = spark.read.parquet(s"$path/banded"),
      signatures = spark.read.parquet(s"$path/signatures"),
      k = p.getInt(0), bands = p.getInt(1), shingleN = p.getInt(2))
  }

  /** Extend a [[save]]d index in place with a new batch of documents:
    * their band and signature rows (computed with the STORED params,
    * so old and new rows band identically) are appended to the
    * parquet tables — the admit step of the daily cycle
    * (probe → drop verified dups → append the admitted remainder).
    * Parquet append only adds files, so a concurrent reader sees
    * either the old or the new listing, never a torn table; params
    * are immutable for the life of the index.
    *
    * Crash safety (the two appends cannot be one atomic commit
    * without a manifest layer): signatures write FIRST, so a crash
    * between the writes leaves signature rows whose band rows are
    * missing — those docs are invisible to candidate generation
    * (inert rows), never band hits that silently drop at the verify
    * join. Re-running the same append completes the index:
    * duplicate banded rows are absorbed by [[probe]]'s candidate
    * `distinct`, duplicate signature rows by its output pair
    * dedup — append retries are idempotent by construction
    * (review-caught: the opposite write order turns a crash into
    * permanently missed duplicates).
    *
    * Caller contract: append only docs whose ids are NOT yet in the
    * index (the admitted survivors of a [[probe]]) — appending an
    * existing id would alias two documents under one id in later
    * probes' verify joins.
    */
  def append(spark: SparkSession, path: String, docs: DataFrame,
             textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val idx = load(spark, path)
    val add = build(docs, idx.k, idx.bands, idx.shingleN, textCol, idCol)
    add.signatures.write.mode("append").parquet(s"$path/signatures")
    add.banded.write.mode("append").parquet(s"$path/banded")
  }

  /** The per-document band-key array (array of (band, key) structs)
    * a given index layout assigns to a text column — the probe-side
    * hashing exposed as a Column so STREAMING admission gates can
    * band micro-batch docs identically to the stored corpus
    * ([[graft.streaming.StreamingDedup]]'s corpus gate).
    */
  def bandKeysFor(text: Column, index: Index): Column =
    Dedup.bandArray(
      Dedup.signatureFromHashes(
        org.apache.spark.sql.graft.ShingleHashes(text, index.shingleN), index.k),
      index.k, index.bands)

  /** Near-dup pairs between a (typically increment-sized) batch and
    * the indexed corpus: batch documents hash and band with the
    * index's OWN params, candidates come from the (band, key) bucket
    * join, and every candidate is verified with exact Jaccard over
    * the stored shingle-hash sets — same no-false-positive contract
    * as [[Dedup.minhashPairs]], restricted to cross pairs.
    *
    * Self-pairs (a batch row whose id already exists in the index,
    * e.g. an idempotent re-probe after a partial ingest) are
    * excluded by id — a document is not a duplicate of itself.
    *
    * Output: (batch_id, corpus_id, jaccard), jaccard ≥ threshold.
    */
  def probe(index: Index, batch: DataFrame, threshold: Double = 0.7,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // the batch side is read twice (banding + verify) but NOT cached
    // here: a cache owned by a lazy operator has no unpersist point,
    // and the advertised probe-per-increment service lifecycle would
    // leak one pinned DataFrame per call (review-caught). The batch
    // is increment-sized by contract; callers probing the same batch
    // repeatedly can cache it themselves.
    val batchHashed = batch
      .select(col(idCol).as("batch_id"),
        org.apache.spark.sql.graft.ShingleHashes(col(textCol), index.shingleN).as("hs_b"))
      .filter(size(col("hs_b")) > 0)
    val batchBands = batchHashed
      .withColumn("sig", Dedup.signatureFromHashes(col("hs_b"), index.k))
      .select(col("batch_id"),
        explode(Dedup.bandArray(col("sig"), index.k, index.bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("batch_id"))
    val candidates = index.banded
      .join(batchBands, Seq("band", "key"))
      .filter(col("id") =!= col("batch_id"))
      .select(col("batch_id"), col("id").as("corpus_id"))
      .distinct()
    candidates
      .join(index.signatures.select(col("id").as("corpus_id"), col("hs").as("hs_c")),
        "corpus_id")
      .join(batchHashed.select(col("batch_id"), col("hs_b")), "batch_id")
      .withColumn("jaccard",
        size(array_intersect(col("hs_b"), col("hs_c"))).cast("double") /
          size(array_union(col("hs_b"), col("hs_c"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
      // pair-level dedup: duplicate SIGNATURE rows (a replayed
      // [[append]] — its documented recovery path) would otherwise
      // emit the same verified pair once per copy; jaccard is
      // identical across copies so any survivor is correct
      .dropDuplicates("batch_id", "corpus_id")
  }
}
