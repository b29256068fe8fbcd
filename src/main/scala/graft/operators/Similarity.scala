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
    * products with fixed ±1 hyperplanes. Vectors in the same bucket
    * are likely neighbors; the bucket id is the shuffle key, so ANN
    * probing shuffles each corpus row exactly once regardless of
    * query count.
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 8): Column = {
    val bits = (0 until nPlanes).map { p =>
      val planeDot = (0 until dim).map { d =>
        val s = planeComponent(p, d)
        val e = element_at(vec, d + 1).cast("double")
        if (s > 0) e else -e
      }.reduce(_ + _)
      when(planeDot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** ANN top-k: probe only the query's own LSH bucket. Recall < 1 by
    * construction (neighbors straddling a hyperplane land in other
    * buckets); raise recall with fewer planes or multiprobe. The
    * join is a hash join on the bucket id — at 100 TB the corpus
    * shuffles once by bucket, versus brute-force's full corpus scan
    * per query batch.
    */
  def annLsh(queries: DataFrame, corpus: DataFrame, dim: Int,
             kNeighbors: Int = 10, nPlanes: Int = 8): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col("embedding"), dim, nPlanes))
    val qb = queries.withColumn("bucket", lshBucket(col("query_vec"), dim, nPlanes))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("query_vec"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** All embedding pairs with cosine ≥ threshold, LSH-bucketed
    * (embedding-based near-dup detection). Same band trick as
    * MinHash: pair only within buckets, verify with exact cosine.
    */
  def cosinePairs(corpus: DataFrame, dim: Int, threshold: Double = 0.95,
                  nPlanes: Int = 8): DataFrame = {
    val cb = corpus
      .select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val a = cb.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = cb.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("e_a"), col("e_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .distinct()
  }
}
