package graft.operators

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("IVF search returns true-cosine scores with decent recall vs brute force") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.knnBruteForce(queries, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    val index = IvfIndex.build(emb, nCells = 16)
    assert(index.centroids.length === 16)
    val approx = IvfIndex.search(index, queries, kNeighbors = 5, nProbe = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    val recall = (exact & approx).size.toDouble / exact.size
    assert(approx.size === exact.size)
    // near-random vectors scatter across cells; with 6/16 cells probed
    // the floor is ~6/16 — real clustered embeddings recall far higher
    assert(recall >= 0.3, s"IVF recall degraded: $recall")
  }

  test("search fails fast when the query set exceeds the driver-collect cap") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val index = IvfIndex.build(emb, nCells = 4)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.search(index, queries, kNeighbors = 3, nProbe = 2,
        maxDriverQueries = 5)
    }
    assert(e.getMessage.contains("maxDriverQueries"))
  }

  test("probing all cells recovers brute force exactly") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.knnBruteForce(queries, emb, 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val index = IvfIndex.build(emb, nCells = 8)
    val full = IvfIndex.search(index, queries, kNeighbors = 5, nProbe = 8)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(full === exact)
  }
}
