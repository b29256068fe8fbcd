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

  test("query sets beyond the driver cap probe executor-side, identically") {
    // the old hard `require` cap is gone: a query set larger than
    // maxDriverQueries selects probes on the executors against the
    // broadcast centroid matrix — same rankCells, same results
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val index = IvfIndex.build(emb, nCells = 4)
    def results(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val collected = results(
      IvfIndex.search(index, queries, kNeighbors = 3, nProbe = 2))
    // 10 queries > cap of 5 → distributed path, implicitly
    val overCap = results(
      IvfIndex.search(index, queries, kNeighbors = 3, nProbe = 2,
        maxDriverQueries = 5))
    // and explicitly
    val forced = results(
      IvfIndex.search(index, queries, kNeighbors = 3, nProbe = 2,
        forceDistributed = true))
    assert(overCap === collected,
      "distributed probe selection must match the driver-collected path")
    assert(forced === collected)
  }

  test("save/load round-trips the index and searches identically") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val queries = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val index = IvfIndex.build(emb, nCells = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.save(index, path)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.centroids.length === index.centroids.length)
    assert(loaded.centroids.zip(index.centroids).forall { case (a, b) => a.sameElements(b) })
    assert(loaded.assigned.count() === index.assigned.count())
    val before = IvfIndex.search(index, queries, kNeighbors = 5, nProbe = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val after = IvfIndex.search(loaded, queries, kNeighbors = 5, nProbe = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(after === before, "a reloaded index must answer byte-identically")
  }

  test("load rejects a non-dense centroid table instead of mis-ranking probes") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val index = IvfIndex.build(emb, nCells = 4)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-bad").toString
    IvfIndex.save(index, path)
    // corrupt: drop centroid 0
    val cents = spark.read.parquet(s"$path/centroids").filter($"cell" =!= 0)
    cents.write.mode("overwrite").parquet(s"$path/centroids2")
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf)
      f.delete(); ()
    }
    val corrupt = new java.io.File(s"$path/centroids")
    rmrf(corrupt)
    assert(new java.io.File(s"$path/centroids2").renameTo(corrupt))
    val e = intercept[IllegalArgumentException](IvfIndex.load(spark, path))
    assert(e.getMessage.contains("not dense"))
  }

  test("recall@10 is non-decreasing in nProbe and exact at all-cells") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.knnBruteForce(queries, emb, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val index = IvfIndex.build(emb, nCells = 8)
    // candidate sets are nested in nProbe, and true top-10 members
    // outrank every non-member under the same cosine — so recall is
    // monotone by construction; this pins the property end-to-end
    val recalls = Seq(1, 2, 4, 8).map { p =>
      val approx = IvfIndex.search(index, queries, kNeighbors = 10, nProbe = p)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      p -> (exact & approx).size.toDouble / exact.size
    }
    recalls.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (nProbe=$p1) to $r2 (nProbe=$p2)")
    }
    assert(recalls.last._2 === 1.0, "all-cells probe must equal brute force")
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

  test("append assigns new vectors to the frozen quantizer: all-cells search equals a rebuilt index (r16)") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val first = emb.filter($"vec_id" % 2 === 0)
    val increment = emb.filter($"vec_id" % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    IvfIndex.save(IvfIndex.build(first, nCells = 6), path)
    val drift = IvfIndex.append(spark, path, increment)
    assert(drift.total === IvfIndex.load(spark, path).assigned.count())
    val appended = IvfIndex.load(spark, path)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    def res(ix: IvfIndex.Index) =
      IvfIndex.search(ix, queries, kNeighbors = 5, nProbe = 6)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
        .collect().toSet
    // at nProbe = all cells, cell assignment cannot hide a neighbor:
    // the appended index must equal a FULL rebuild (and brute force)
    assert(res(appended) === res(IvfIndex.build(emb, nCells = 6)).map(identity),
      "append must be search-equivalent to a rebuild at nProbe=all")
    // assignment parity: every appended vector sits in the cell the
    // search path itself would rank first for it (argmax cosine)
    val cents = appended.centroids
    appended.assigned.join(increment.select($"vec_id"), Seq("vec_id"), "left_semi")
      .select($"vec_id", $"embedding", $"cell").as[(Long, Array[Float], Int)]
      .collect().foreach { case (id, v, cell) =>
        var best = -1; var bestSim = Double.MinValue
        cents.zipWithIndex.foreach { case (c, i) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var k = 0
          while (k < math.min(v.length, c.length)) {
            dot += v(k) * c(k); na += v(k) * v(k); nb += c(k) * c(k); k += 1 }
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          if (!sim.isNaN && sim > bestSim) { bestSim = sim; best = i }
        }
        assert(cell === best, s"vec $id assigned to $cell, nearest centroid is $best")
      }
    // IDEMPOTENT REPLAY: re-appending the same batch is a no-op
    val before = IvfIndex.load(spark, path).assigned.count()
    IvfIndex.append(spark, path, increment)
    assert(IvfIndex.load(spark, path).assigned.count() === before,
      "a crashed-and-retried append must not duplicate assignment rows")
  }

  test("append's drift gate recommends re-training when one cell swallows the increment (r16)") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-drift").toString
    IvfIndex.save(IvfIndex.build(emb, nCells = 8), path)
    assert(!IvfIndex.drift(spark, path).retrainRecommended,
      "a freshly built index must not demand a retrain")
    // an increment of near-identical vectors piles into ONE cell
    val dim = emb.select($"embedding").as[Array[Float]].head().length
    val skewed = (100000L to 100400L).toDF("vec_id")
      .withColumn("embedding", org.apache.spark.sql.functions.typedlit(
        Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.001f).toSeq)
        .cast(emb.schema("embedding").dataType))
      .withColumn("label", org.apache.spark.sql.functions.lit(9)
        .cast(emb.schema("label").dataType))
      .select(emb.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    val drift = IvfIndex.append(spark, path, skewed)
    assert(drift.retrainRecommended,
      s"skew ${drift.skew} after a single-direction increment must trip the gate")
  }
}
