package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def sfDocs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet

  test("probe equals the self-join's cross-pair restriction (ground truth)") {
    val docs = sfDocs
    val batch = docs.filter($"doc_id" % 5 === 0)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val viaIndex = pairSet(MinHashIndex.probe(MinHashIndex.build(corpus), batch, 0.7))
    // authority: the full self-join, restricted to batch x corpus pairs
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val viaSelfJoin = Dedup.minhashPairs(docs, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .collect {
        case (a, b) if batchIds(a) && !batchIds(b) => (a, b)
        case (a, b) if batchIds(b) && !batchIds(a) => (b, a)
      }.toSet
    assert(viaIndex === viaSelfJoin)
    assert(viaIndex.nonEmpty, "vacuous: no cross pairs at sf0.001")
  }

  test("save/load round-trip probes identically, params survive") {
    val dir = Files.createTempDirectory("mhidx").toString
    val docs = sfDocs
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val built = MinHashIndex.build(corpus, k = 24, bands = 8, shingleN = 3)
    MinHashIndex.save(built, dir)
    val loaded = MinHashIndex.load(spark, dir)
    assert((loaded.k, loaded.bands, loaded.shingleN) === (24, 8, 3))
    assert(pairSet(MinHashIndex.probe(loaded, batch, 0.7)) ===
      pairSet(MinHashIndex.probe(built, batch, 0.7)))
    // persisted tables carry the full banding: row counts match
    assert(loaded.banded.count() === built.banded.count())
    assert(loaded.signatures.count() === built.signatures.count())
  }

  test("append extends a saved index: probe equals an index built on the union") {
    val dir = Files.createTempDirectory("mhidx_app").toString
    val docs = sfDocs
    val first = docs.filter($"doc_id" % 3 === 0)
    val second = docs.filter($"doc_id" % 3 === 1)
    val batch = docs.filter($"doc_id" % 3 === 2)
    MinHashIndex.save(MinHashIndex.build(first), dir)
    MinHashIndex.append(spark, dir, second)
    val got = pairSet(MinHashIndex.probe(MinHashIndex.load(spark, dir), batch, 0.7))
    val want = pairSet(
      MinHashIndex.probe(MinHashIndex.build(first.unionByName(second)), batch, 0.7))
    assert(got === want)
    assert(want.nonEmpty, "vacuous: no cross pairs for the append split")
  }

  test("replayed append (crash-retry) yields the same probe result, no duplicate pairs") {
    val dir = Files.createTempDirectory("mhidx_replay").toString
    val docs = sfDocs
    val first = docs.filter($"doc_id" % 3 === 0)
    val second = docs.filter($"doc_id" % 3 === 1)
    val batch = docs.filter($"doc_id" % 3 === 2)
    MinHashIndex.save(MinHashIndex.build(first), dir)
    MinHashIndex.append(spark, dir, second)
    MinHashIndex.append(spark, dir, second) // the documented recovery path
    val pairs = MinHashIndex.probe(MinHashIndex.load(spark, dir), batch, 0.7)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSeq
    assert(pairs.distinct.size === pairs.size, "replayed rows must not duplicate pairs")
    assert(pairs.toSet ===
      pairSet(MinHashIndex.probe(MinHashIndex.build(first.unionByName(second)), batch, 0.7)))
  }

  test("load refuses an index with a corrupt params table") {
    val dir = Files.createTempDirectory("mhidx_bad").toString
    val built = MinHashIndex.build(Seq((1L, "one two three four five")).toDF("doc_id", "text"))
    MinHashIndex.save(built, dir)
    // two params rows = ambiguous band layout
    spark.read.parquet(s"$dir/params")
      .unionAll(spark.read.parquet(s"$dir/params"))
      .write.mode("overwrite").parquet(s"$dir/params2")
    val fs = new java.io.File(s"$dir/params")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(fs)
    new java.io.File(s"$dir/params2").renameTo(fs)
    val e = intercept[IllegalArgumentException](MinHashIndex.load(spark, dir))
    assert(e.getMessage.contains("params"))
  }

  test("re-probe with overlapping ids excludes self-pairs, keeps true dups") {
    val text = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq((1L, text), (2L, "unrelated words about completely different topics entirely")).toDF("doc_id", "text")
    // batch re-delivers doc 1 under its own id (idempotent re-probe)
    // AND as a fresh id (a genuine duplicate admission attempt)
    val batch = Seq((1L, text), (99L, text)).toDF("doc_id", "text")
    val got = pairSet(MinHashIndex.probe(MinHashIndex.build(corpus), batch, 0.9))
    assert(got === Set((99L, 1L)), s"got $got")
  }

  test("shingle-less batch docs are dropped, not phantom-matched") {
    val corpus = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val batch = Seq((50L, "hi"), (51L, "")).toDF("doc_id", "text")
    assert(MinHashIndex.probe(MinHashIndex.build(corpus), batch, 0.1).count() === 0L)
  }
}
