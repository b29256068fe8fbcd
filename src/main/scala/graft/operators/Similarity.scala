package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  *  - [[cosine]]: a pure Column expression (sequential fold, so the
  *    result is bit-deterministic and oracle-reproducible).
  *  - [[knnBruteForce]]: exact top-k — broadcast the (small) query
  *    set against the full corpus; the corpus side never shuffles
  *    until the per-query top-k reduction. This is the correctness
  *    baseline.
  *  - [[annLsh]]: the scale path — random-hyperplane (SimHash) LSH:
  *    sign-bit signatures bucket the corpus, queries probe only their
  *    own bucket. Hyperplanes are derived deterministically from
  *    md5, so no RNG state needs shipping.
  */
object Similarity {

  /** Element-wise dot product folded left-to-right in double
    * precision (deterministic fold order). Kept as the reference
    * formulation; the hot path uses the fused native expression.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm — native codegen'd expression
    * ([[org.apache.spark.sql.graft.VectorNorm]]), bit-identical to
    * `sqrt(dot(a, a))` (same sequential double accumulation).
    */
  def norm(a: Column): Column = org.apache.spark.sql.graft.VectorNorm(a)

  /** Cosine similarity — native codegen'd expression
    * ([[org.apache.spark.sql.graft.CosineSimilarity]]), bit-identical
    * to the sequential Column fold it replaces (same left-to-right
    * double accumulation), so oracle-compared values don't move.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSimilarity(a, b)

  /** Two-phase distributed top-k: reduce scored (query_id, vec_id,
    * sim) rows to the k best per query via the bounded-heap aggregate
    * [[org.apache.spark.sql.graft.TopKByScore]]. The partial
    * (map-side) phase shrinks every input partition to one k-sized
    * heap per query BEFORE the shuffle, so the full scored set never
    * funnels into |queries| window partitions — only
    * |queries| × |partitions| heaps of k pairs move. Ordering matches
    * `ORDER BY sim DESC, vec_id ASC` exactly (ties by id).
    */
  private[graft] def topKPerQuery(scored: DataFrame, kNeighbors: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(org.apache.spark.sql.graft.TopKByScore(
        col("sim"), col("vec_id"), kNeighbors).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("sim"))

  /** Cosine is UNDEFINED for zero-norm (or NULL) vectors — the fused
    * kernel returns NaN there, and Spark's comparison/sort semantics
    * rank NaN ABOVE every real similarity (a zero vector would "win"
    * every top-k and pass every `sim >= t` gate). Every similarity
    * entry point drops such rows up front; the `emb_norms` audit
    * query is the operator that REPORTS them.
    */
  private def nonDegenerate(df: DataFrame, vecCol: String): DataFrame =
    df.filter(org.apache.spark.sql.graft.VectorNorm(col(vecCol)) > 0)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * Plan shape: broadcast-nested-loop of (tiny) queries × corpus —
    * the corpus scan is embarrassingly parallel, and the per-query
    * reduction is the two-phase [[topKPerQuery]] aggregate: each scan
    * partition emits at most k candidates per query map-side, so the
    * scored corpus itself never shuffles. Ties broken by neighbor id
    * for determinism.
    *
    * @param queries  (query_id, query_vec) — must be small (broadcast)
    * @param corpus   (vec_id, embedding)
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, kNeighbors: Int = 10): DataFrame = {
    val scored = nonDegenerate(corpus, "embedding")
      .crossJoin(broadcast(nonDegenerate(queries, "query_vec")))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("query_vec"), col("embedding")))
    topKPerQuery(scored, kNeighbors)
  }

  /** Multi-table SimHash bucket ids — one long per hash table,
    * computed by the native codegen'd expression
    * [[org.apache.spark.sql.graft.SimHashBuckets]] (the Column-fold
    * formulation ran interpreted and dominated the ANN bench).
    * OR-amplification: a candidate needs to collide in ANY table, so
    * recall ≈ 1-(1-p^bits)^tables for per-plane agreement
    * probability p.
    */
  def lshBuckets(vec: Column, nPlanes: Int, tables: Int): Column =
    org.apache.spark.sql.graft.SimHashBuckets(vec, nPlanes, tables)

  /** ANN top-k via multi-table random-hyperplane LSH.
    *
    * The corpus is exploded to `tables` rows each and hash-joined to
    * the (broadcast) queries on (table, bucket) — each corpus row is
    * scored at most once per colliding table and deduped before the
    * exact-cosine ranking. At 100 TB this replaces brute-force's
    * full-corpus scoring with |candidates| ≈ corpus/2^bits per
    * table — the classic recall-vs-cost dial (`nPlanes` up = cheaper
    * + lower recall; `tables` up = costlier + higher recall).
    */
  def annLsh(rawQueries: DataFrame, rawCorpus: DataFrame,
             kNeighbors: Int = 10, nPlanes: Int = 4,
             tables: Int = 16): DataFrame = {
    val corpus = nonDegenerate(rawCorpus, "embedding")
    val queries = nonDegenerate(rawQueries, "query_vec")
    // Bucket probing carries ONLY ids — exploding the corpus
    // `tables`-fold with the embedding payload attached multiplies
    // shuffle bytes by tables × vector-size (benched 7 s at sf0.1
    // from payload copies alone); vectors join back in exactly once
    // per surviving candidate.
    val cb = corpus.select(col("vec_id"),
      posexplode(lshBuckets(col("embedding"), nPlanes, tables)).as(Seq("tbl", "bucket")))
    val qb = queries.select(col("query_id"),
      posexplode(lshBuckets(col("query_vec"), nPlanes, tables)).as(Seq("tbl", "bucket")))
    val candidates = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val scored = candidates
      .join(corpus, "vec_id")
      .join(broadcast(queries), "query_id")
      .withColumn("sim", cosine(col("query_vec"), col("embedding")))
    topKPerQuery(scored, kNeighbors)
  }

  /** All embedding pairs with cosine ≥ threshold, LSH-bucketed
    * (embedding-based near-dup detection). Same shape as MinHash
    * banding: pair only within (table, bucket) groups, dedupe the
    * candidates, verify with exact cosine. At the near-dup
    * thresholds this targets (≥ 0.9, angle ≤ 26°) per-table
    * collision is ≈ 0.85^bits, so a handful of tables reaches
    * near-perfect recall while keeping buckets small.
    */
  def cosinePairs(rawCorpus: DataFrame, threshold: Double = 0.95,
                  nPlanes: Int = 8, tables: Int = 8,
                  targetBucketSize: Int = 4,
                  knownCount: Option[Long] = None): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0,
      s"cosine threshold must be in (0, 1), got $threshold")
    val corpus = nonDegenerate(rawCorpus, "embedding")
    // A FIXED code width is a scale trap for the SELF-join: bucket
    // occupancy grows linearly with the corpus and the within-bucket
    // pairing quadratically — 26× rows benched 150× wall-time before
    // this (caught by the round-6 full-surface stress bench). Size
    // the code to the corpus instead, like every production LSH:
    // grow the hyperplane count until expected occupancy is
    // ~targetBucketSize, keeping the join ~linear in corpus size.
    // Occupancy targets SMALL (4, not the earlier 16): every vector
    // generates ~(occ−1)/2 candidate pairs per table BY CONSTRUCTION,
    // and each surviving candidate drags a vector payload through the
    // verify join — the dominant shuffle. Measured on the 26× stress
    // corpus (52 k vectors): occ 16 → 6.18 M candidates / 577 MB
    // shuffled; occ 4 → ~1.9 M / 369 MB; occ 2 → 1.30 M / 272 MB.
    // Smaller occupancy costs more bits (and so more tables via the
    // retention growth below) but cuts candidates ~5× — the explode
    // rows are ids-only and cheap, the candidates are not. Below 4
    // the marginal gain flattens while table count keeps climbing.
    // The count is taken on the RAW corpus (parquet count, no norm
    // filter) so the sizing pass stays metadata-cheap; the handful
    // of degenerate vectors can't move a log2. Callers that already
    // know the corpus size pass it via `knownCount`, which removes
    // the sizing job entirely (and the plan-build-time eagerness the
    // count would otherwise impose).
    val n = knownCount.getOrElse(rawCorpus.count())
    val bits = math.max(nPlanes,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketSize)) /
        math.log(2)).toInt)
    // Exact duplicates collide in every table at ANY width
    // (identical vectors ⇒ identical signs), but each extra bit
    // multiplies the per-table collision probability of a
    // THRESHOLD pair by the per-plane agreement probability
    // p = 1 − θ/π = 1 − acos(threshold)/π (random-hyperplane LSH) —
    // so the table count grows by 1/p per extra bit, holding overall
    // recall ~constant AT THE CALLER'S threshold. Deriving p from
    // the parameter matters: the previous hard-coded 0.9 was the
    // p of cos = 0.95 only — at threshold 0.9, p ≈ 0.857, and
    // under-compensated tables silently shed recall as the corpus
    // (and therefore bits) grows (advisor-caught). Table cost is
    // LINEAR in the corpus, unlike the quadratic bucket blowup this
    // replaces.
    val p = 1.0 - math.acos(threshold) / math.Pi
    val tbl = math.ceil(
      tables * math.pow(1.0 / p, math.max(0, bits - nPlanes))).toInt
    // ids-only through the bucket self-join (see annLsh), vectors
    // joined back for the exact-cosine verify
    val cb = corpus
      .select(col("vec_id"),
        posexplode(lshBuckets(col("embedding"), bits, tbl)).as(Seq("tbl", "bucket")))
    val a = cb.select(col("tbl"), col("bucket"), col("vec_id").as("id_a"))
    val b = cb.select(col("tbl"), col("bucket"), col("vec_id").as("id_b"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .join(corpus.select(col("vec_id").as("id_a"), col("embedding").as("e_a")), "id_a")
      .join(corpus.select(col("vec_id").as("id_b"), col("embedding").as("e_b")), "id_b")
      .withColumn("sim", cosine(col("e_a"), col("e_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
