package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup

/** The round-4 curation additions: sliding-window chunking, canonical
  * selection per near-dup cluster, and the embedding-norm hygiene
  * report — each checked against an independent in-test reference
  * implementation (not against its own building blocks).
  */
class CurationQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("doc_chunks matches a per-doc Scala reference: coverage, overlap, counts") {
    val W = 64
    val S = 48
    val got = Queries.docChunks(spark, sfSmoke)
      .as[(Long, Long, Long, String)].collect().toSeq
    val texts = graft.tables.Tables.documents(spark, sfSmoke)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val expected = texts.flatMap { case (id, text) =>
      val toks = "[A-Za-z0-9]+".r.findAllIn(text).toVector
      val n = toks.size
      val nChunks = if (n <= W) 1 else math.ceil((n - W).toDouble / S).toInt + 1
      (0 until nChunks).map { c =>
        val slice = toks.slice(c * S, c * S + W)
        (id, c.toLong, slice.size.toLong, slice.mkString(" "))
      }
    }
    assert(got.sorted === expected.sorted)
    // every token position is covered by at least one chunk
    val tokenTotal = texts.map { case (_, t) => "[A-Za-z0-9]+".r.findAllIn(t).size }.sum
    val coveredUpper = got.map(_._3).sum // ≥ total because of overlap
    assert(coveredUpper >= tokenTotal)
  }

  test("dedup_canonical agrees with union-find + arg-max over the verified pair list") {
    val docsDf = graft.tables.Tables.documents(spark, sfSmoke)
    val quality = docsDf
      .select($"doc_id", TextFunctions.qualityScore($"text").as("q"))
      .as[(Long, Double)].collect().toMap
    val pairs = Dedup.minhashPairs(docsDf, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    // independent union-find (main code uses iterative label propagation)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    quality.keys.foreach(id => parent.getOrElseUpdate(id, id))
    pairs.foreach { case (a, b) => union(a, b) }
    val byCluster = quality.keys.toSeq.groupBy(find)
    val expected = byCluster.map { case (root, members) =>
      val best = members.minBy(id => (-quality(id), id))
      (root, members.size.toLong, best, quality(best))
    }.toSeq.sortBy(_._1)
    val got = Queries.dedupCanonical(spark, sfSmoke)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got === expected)
    // non-vacuous: at least one multi-member cluster in the fixture data
    assert(got.exists(_._2 > 1), "smoke data should contain near-dup clusters")
  }

  test("emb_norms flags exactly the planted anomalies") {
    // (label, n_vecs, n_nonfinite, n_ragged, n_zero, n_anomalous, mean_norm)
    val got = Queries.embNorms(spark, sfSmoke)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val planted = got(-1L)
    assert(planted._2 == 2L, s"planted label row: $planted")
    assert(planted._3 == 0L, "driver corpus has no non-finite vectors")
    assert(planted._4 == 0L, "driver corpus has no ragged vectors")
    assert(planted._5 == 1L, "exactly one zero vector")
    assert(planted._6 == 2L, "zero and 3x-scaled are both off-unit")
    assert(math.abs(planted._7 - 1.5) < 1e-5, s"mean of 0 and 3 is 1.5: $planted")
    // the driver corpus itself is unit-normalized: no false positives
    got.filter { case (k, _) => k >= 0 }.values.foreach { r =>
      assert(r._3 == 0L && r._4 == 0L && r._5 == 0L && r._6 == 0L,
        s"false anomaly in corpus label row: $r")
      assert(math.abs(r._7 - 1.0) < 1e-4, s"corpus mean norm should be ~1: $r")
    }
  }

  test("non-finite vectors: excluded from the similarity universe, counted by the audit") {
    import org.apache.spark.sql.functions._
    // a corrupt row in every position the fuzz harness plants it:
    // NaN head, Inf tail, -Inf middle
    val dim = 64
    val mk = (poison: Double, at: Int) =>
      Array.tabulate(dim)(i => if (i == at) poison else 0.1)
    val bad = Seq(
      (900001L, mk(Double.NaN, 0), 3L),
      (900002L, mk(Double.PositiveInfinity, dim - 1), 3L),
      (900003L, mk(Double.NegativeInfinity, dim / 2), 3L),
      (900005L, Array.fill(dim - 1)(0.1), 3L), // ragged: truncated write
      (900006L, Array.fill(dim + 1)(0.1), 3L), // ragged: over-long
      (900004L, Array.fill(dim)(0.1), 3L)) // finite control row
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("embfinite").toString
    bad.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val kept = graft.tables.Tables.embeddingsFinite(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(900004L),
      s"only the finite control row survives the boundary: $kept")
    // ...and every excluded row is VISIBLE in the audit (advice r12:
    // ragged vectors used to be silently excluded with no audit arm):
    // 3 non-finite + 2 ragged excluded, 1 finite control in the stats
    val audit = Queries.embNorms(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val g = audit(3L)
    assert(g._2 == 6L, s"all six rows counted: $g")
    assert(g._3 == 3L, s"NaN/Inf/-Inf rows in n_nonfinite: $g")
    assert(g._4 == 2L, s"truncated + over-long rows in n_ragged: $g")
    assert(g._5 == 0L && g._6 == 1L,
      s"finite stats cover only the control row (norm 0.8 is anomalous): $g")
    assert(math.abs(g._7 - 0.8) < 1e-5,
      s"mean_norm over the one admitted row: $g")
  }
}
