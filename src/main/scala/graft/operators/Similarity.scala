package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * precision. `zip_with` + `aggregate` keeps everything inside
    * codegen; the explicit fold order makes the float math
    * deterministic.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * Plan shape: broadcast-nested-loop of (tiny) queries × corpus —
    * the corpus scan is embarrassingly parallel and partial top-k
    * could be pushed per-partition; the final per-query reduction
    * shuffles only corpus×|queries| rows already filtered to
    * candidate scores. Ties broken by neighbor id for determinism.
    *
    * @param queries  (query_id, query_vec) — must be small (broadcast)
    * @param corpus   (vec_id, embedding)
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, kNeighbors: Int = 10): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("query_vec"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Deterministic ±1 hyperplane component for (plane, dim): sign of
    * a md5-derived bit. Cheap, stateless, reproducible.
    */
  private def planeComponent(plane: Int, dim: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$dim".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1 else -1
  }

  /** SimHash-style LSH bucket key: `nPlanes` sign bits of dot
    * products with fixed ±1 hyperplanes (plane set selected by
    * `table` for multi-table amplification). Vectors in the same
    * bucket are likely neighbors; the bucket id is the shuffle key.
    *
    * The plane is embedded as one array LITERAL folded with
    * `zip_with`+`aggregate`, not `dim` unrolled `element_at` terms —
    * the unrolled form ballooned to multi-MiB codegen blobs
    * (dim × planes × tables leaf expressions) that spilled out of
    * JIT budgets; the fold keeps the generated code O(planes).
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, table: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val signs = Array.tabulate(dim)(d =>
        planeComponent(table * nPlanes + p, d).toDouble)
      val planeDot = aggregate(
        zip_with(vec, lit(signs), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(planeDot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** All (table, bucket) probe keys for a vector — one row per hash
    * table (OR-amplification: a candidate needs to collide in ANY
    * table, so recall ≈ 1-(1-p^bits)^tables for per-plane agreement
    * probability p).
    */
  private def lshKeys(vec: Column, dim: Int, nPlanes: Int, tables: Int): Column =
    explode(array((0 until tables).map(t =>
      struct(lit(t).as("tbl"), lshBucket(vec, dim, nPlanes, t).as("bucket"))): _*))

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
  def annLsh(queries: DataFrame, corpus: DataFrame, dim: Int,
             kNeighbors: Int = 10, nPlanes: Int = 4,
             tables: Int = 16): DataFrame = {
    val cb = corpus.select(col("vec_id"), col("embedding"),
      lshKeys(col("embedding"), dim, nPlanes, tables).as("k"))
      .select(col("vec_id"), col("embedding"), col("k.tbl").as("tbl"), col("k.bucket").as("bucket"))
    val qb = queries.select(col("query_id"), col("query_vec"),
      lshKeys(col("query_vec"), dim, nPlanes, tables).as("k"))
      .select(col("query_id"), col("query_vec"), col("k.tbl").as("tbl"), col("k.bucket").as("bucket"))
    val candidates = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_vec"), col("vec_id"), col("embedding"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates
      .withColumn("sim", cosine(col("query_vec"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** All embedding pairs with cosine ≥ threshold, LSH-bucketed
    * (embedding-based near-dup detection). Same shape as MinHash
    * banding: pair only within (table, bucket) groups, dedupe the
    * candidates, verify with exact cosine. At the near-dup
    * thresholds this targets (≥ 0.9, angle ≤ 26°) per-table
    * collision is ≈ 0.85^bits, so a handful of tables reaches
    * near-perfect recall while keeping buckets small.
    */
  def cosinePairs(corpus: DataFrame, dim: Int, threshold: Double = 0.95,
                  nPlanes: Int = 8, tables: Int = 8): DataFrame = {
    val cb = corpus
      .select(col("vec_id"), col("embedding"),
        lshKeys(col("embedding"), dim, nPlanes, tables).as("k"))
      .select(col("vec_id"), col("embedding"), col("k.tbl").as("tbl"), col("k.bucket").as("bucket"))
    val a = cb.select(col("tbl"), col("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = cb.select(col("tbl"), col("bucket"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("e_a"), col("e_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("e_a"), col("e_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
