package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the
  * clustering-based alternative to the hyperplane LSH in
  * [[Similarity.annLsh]].
  *
  * Index build: k-means coarse quantizer (spark.ml, seeded →
  * deterministic) assigns every corpus vector to one of `nCells`
  * cells — at 100 TB the assignment is one narrow pass and cells
  * shard naturally across executors.
  *
  * Search: each query scores only the `nProbe` nearest cells'
  * vectors — the centroid table is tiny and lives on the driver, so
  * probe selection is free, and the corpus join is a hash join on
  * the cell id. Cost ≈ nProbe/nCells of brute force; recall grows
  * with nProbe (the classic IVF dial).
  */
object IvfIndex {

  /** Corpus with an assigned `cell` column + the centroid matrix. */
  case class Index(assigned: DataFrame, centroids: Array[Array[Double]])

  def build(corpus: DataFrame, nCells: Int = 16, seed: Long = 42L,
            maxIter: Int = 20): Index = {
    // cosine is undefined for zero-norm vectors (NaN, which Spark
    // ranks above every real similarity) — exclude them from the
    // index; the emb_norms audit is where they get reported
    val vecs = corpus
      .filter(org.apache.spark.sql.graft.VectorNorm(col("embedding")) > 0)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(maxIter)
      // cosine distance end-to-end: search() ranks probe cells by
      // cosine, so Euclidean assignment would disagree for
      // unnormalized corpora and silently degrade recall
      // (review-caught; identical ranking on unit-norm vectors)
      .setDistanceMeasure("cosine")
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(vecs)
    val assigned = model.transform(vecs).drop("features")
    Index(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Persist the index as parquet: the (potentially corpus-sized)
    * cell assignment sharded normally, the tiny centroid matrix as
    * one (cell, centroid) table — the production IVF lifecycle,
    * where the quantizer is trained once and probed by many later
    * sessions. Layout: `path/assigned/`, `path/centroids/`.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1) // a handful of rows — one footer beats 32
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a [[save]]d index. The centroid matrix is rebuilt in cell
    * order and validated dense (cells 0..n-1): a silently-missing
    * centroid would mis-rank every probe selection.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val assigned = spark.read.parquet(s"$path/assigned")
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(cents.nonEmpty && cents.map(_._1).sameElements(cents.indices),
      s"corrupt IVF index at $path: centroid cells ${cents.map(_._1).mkString(",")} " +
        s"are not dense 0..${cents.length - 1}")
    Index(assigned, cents.map(_._2))
  }

  private def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Top-k cosine neighbors probing the `nProbe` closest cells per
    * query. `queries` must be small (collected to pick probes and
    * broadcast into the scoring join) — `maxDriverQueries` fences the
    * only driver-side collect in main-path code: exceeding it fails
    * fast instead of silently materializing an unbounded query set
    * on the driver.
    */
  def search(index: Index, rawQueries: DataFrame, kNeighbors: Int = 10,
             nProbe: Int = 4, maxDriverQueries: Int = 10000): DataFrame = {
    val spark = rawQueries.sparkSession
    import spark.implicits._

    // zero-norm query vectors have no defined neighbors (see build)
    val queries = rawQueries
      .filter(org.apache.spark.sql.graft.VectorNorm(col("query_vec")) > 0)
    // driver-side probe selection against the tiny centroid table;
    // limit+1 bounds the fetch itself, not just the post-hoc check
    val q = queries.select(col("query_id"), col("query_vec"))
      .limit(maxDriverQueries + 1).collect()
    require(q.length <= maxDriverQueries,
      s"IvfIndex.search collects queries to the driver for probe selection; " +
        s"got more than $maxDriverQueries — raise maxDriverQueries deliberately " +
        s"or pre-partition the query set")
    val probes = q.flatMap { row =>
      val qid = row.getLong(0)
      val qv = row.getSeq[Float](1).map(_.toDouble).toArray
      index.centroids.zipWithIndex
        .map { case (c, i) => (i, cosineArr(qv, c)) }
        .filterNot(_._2.isNaN) // a degenerate centroid has no defined rank
        .sortBy(-_._2).take(nProbe)
        .map { case (cell, _) => (qid, cell) }
    }.toSeq.toDF("query_id", "cell")

    val candidates = index.assigned
      .join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"))
      .join(broadcast(queries), "query_id")
      .withColumn("sim", Similarity.cosine(col("query_vec"), col("embedding")))
    // two-phase top-k (map-side k-heaps) — see Similarity.topKPerQuery
    Similarity.topKPerQuery(candidates, kNeighbors)
  }
}
