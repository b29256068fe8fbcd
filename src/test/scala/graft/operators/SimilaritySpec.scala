package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
      (Array(3f, 4f), Array(3f, 4f), 1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(Similarity.cosine($"a", $"b").as("sim"), $"expected")
      .as[(Double, Double)].collect()
    got.foreach { case (sim, exp) => assert(math.abs(sim - exp) < 1e-12) }
  }

  test("knnBruteForce ranks by similarity with id tie-break, excludes self") {
    val corpus = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)),
      (4L, Array(1f, 0f)) // exact duplicate of the query direction
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1f, 0f))).toDF("query_id", "query_vec")
    val got = Similarity.knnBruteForce(queries, corpus, 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(got === Seq((1, 4L), (2, 2L), (3, 3L)))
  }

  test("annLsh returns true-similarity scores and high recall on driver embeddings") {
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.knnBruteForce(queries, emb, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annLsh(queries, emb, kNeighbors = 5,
      nPlanes = 4, tables = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(approx.nonEmpty)
    // deterministic (fixed md5 hyperplanes): measured 0.88 on this
    // data; the bound leaves margin for operator-param tweaks
    assert(recall >= 0.6, s"ANN recall degraded: $recall")
  }

  test("cosinePairs finds planted exact-duplicate vectors") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    } :+ (99L, Array.tabulate(8)(d => math.sin(0 * 8 + d).toFloat)) // dup of vec 0
    val corpus = vecs.toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(corpus, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.contains((0L, 99L)))
  }

  test("cosinePairs holds recall at corpus-sized code widths (bits > nPlanes)") {
    // The 1/p-per-extra-bit table growth ARGUES recall is held as the
    // corpus (and so the code width) grows; this measures it. The 26×
    // stress replicas push the sizing into bits > nPlanes, and 50
    // planted cos ≈ 0.95 pairs (exact construction: v' = cos·v̂ +
    // sin·ŵ with ŵ ⊥ v̂) are the ground truth the bucketing must
    // recover. Threshold 0.9 so the exact-cosine verify keeps the
    // planted pairs regardless of float rounding — recall here
    // measures the LSH stage alone.
    graft.GraftSession.tune(spark)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val base = emb.select($"vec_id", $"embedding")
    val scaled = graft.StressBench.scaleEmbeddings(emb, replicas = 26, dims = 64)
      .select($"vec_id", $"embedding")
    val seeds = base.filter($"vec_id" < 50)
      .as[(Long, Array[Float])].collect().toSeq
    val rnd = new scala.util.Random(11)
    val fixed = Array.fill(64)(rnd.nextDouble() * 2 - 1)
    val cosTarget = 0.95
    val planted = seeds.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val vhat = { val n = math.sqrt(vd.map(x => x * x).sum); vd.map(_ / n) }
      val proj = fixed.lazyZip(vhat).map(_ * _).sum
      val w = fixed.lazyZip(vhat).map((u, x) => u - proj * x)
      val what = { val n = math.sqrt(w.map(x => x * x).sum); w.map(_ / n) }
      val sinTarget = math.sqrt(1 - cosTarget * cosTarget)
      (-(id + 1), vhat.lazyZip(what)
        .map((a, b) => (cosTarget * a + sinTarget * b).toFloat).toArray)
    }
    val corpus = scaled.unionByName(planted.toDF("vec_id", "embedding"))
    val n = 26L * base.count() + planted.size
    // the sizing must actually be in the wide regime this test pins
    // (mirror of cosinePairs' formula at the default occupancy 4)
    val bits = math.ceil(math.log(n / 4.0) / math.log(2)).toInt
    assert(bits > 8, s"corpus too small to trigger widening: bits=$bits")
    val pairs = Similarity
      .cosinePairs(corpus, threshold = 0.9, knownCount = Some(n))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = seeds.count { case (id, _) => pairs.contains((-(id + 1), id)) }
    info(s"planted pairs: ${seeds.size}, recovered: $found (bits=$bits)")
    assert(found.toDouble / seeds.size >= 0.9,
      s"wide-code recall degraded: $found/${seeds.size}")
  }

  test("zero-norm vectors are excluded from every similarity path (cosine undefined)") {
    // NaN from 0/0 ranks ABOVE every real similarity in Spark's
    // comparison semantics — without the exclusion a zero vector wins
    // every top-k and passes every threshold gate (fuzz-caught)
    val corpus = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 0f)), // degenerate
      (4L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1f, 0f))).toDF("query_id", "query_vec")
    val knn = Similarity.knnBruteForce(queries, corpus, 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!knn.contains(3L), s"zero vector must not be a neighbor: $knn")
    val ann = Similarity.annLsh(queries, corpus, kNeighbors = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!ann.contains(3L), s"zero vector must not be an ANN candidate: $ann")
    val pairs = Similarity.cosinePairs(corpus, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"zero vector must not pair: $pairs")
    // a zero-norm QUERY has no defined neighbors at all
    val zq = Seq((9L, Array(0f, 0f))).toDF("query_id", "query_vec")
    assert(Similarity.knnBruteForce(zq, corpus, 3).count() == 0L)
  }

  test("norm: native expression is bit-identical to the sequential Column fold") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(1 + rnd.nextInt(64))(rnd.nextFloat() * 20f - 10f))
    }
    val df = vecs.toDF("id", "v")
    val got = df.select($"id",
        Similarity.norm($"v").as("native"),
        sqrt(Similarity.dot($"v", $"v")).as("folded"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (id, n, f) =>
      assert(n == f, s"vec $id: native $n != fold $f") // exact, not approx
    }
    // degenerate shapes: zero vector → 0.0, empty array → 0.0
    val edge = Seq((1L, Array(0f, 0f, 0f)), (2L, Array.empty[Float]))
      .toDF("id", "v")
      .select(Similarity.norm($"v")).as[Double].collect().toSeq
    assert(edge === Seq(0.0, 0.0))
  }
}
