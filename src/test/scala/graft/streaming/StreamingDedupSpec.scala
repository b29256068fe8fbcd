package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Dedup

case class SDoc(doc_id: Long, text: String)

/** Streaming dedup gates ([[StreamingDedup]]): batch equivalence vs
  * [[Dedup.exact]], near-dup key agreement with the batch LSH
  * pipeline, and replay safety across a checkpoint restart — the
  * delivery-semantics bar IngestStreamSpec sets for the ingest DAG,
  * applied to the LLM-pipeline gate.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sdedup").toString

  private def baseDocs: Seq[SDoc] =
    spark.read.parquet(s"$sfSmoke/documents.parquet")
      .selectExpr("doc_id", "text").as[SDoc]
      .collect().toSeq.sortBy(_.doc_id)

  /** Drive a gate query over MemoryStream chunks, one micro-batch per
    * chunk (processAllAvailable between addData calls), parquet sink.
    */
  private def runGate(chunks: Seq[Seq[SDoc]],
                      gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[StreamingDedup.KeyedDoc],
                      ckpt: String = tmp(), out: String = tmp()): String = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[SDoc]
    val q = gate(ms.toDF())
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    out
  }

  test("exact gate batch-equivalence: admitted set == Dedup.exact on the same corpus") {
    val docs = baseDocs
    // exact text copies under new ids, delivered in a LATER micro-batch
    // so first-seen == min-id and the comparison is deterministic
    val dups = docs.take(25).map(d => SDoc(d.doc_id + 1000000L, d.text))
    val out = runGate(Seq(docs, dups), df => StreamingDedup.dedupeExact(df, ttlMs = 0L))
    val admitted = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet

    val batch = Dedup.exact(docs.toDF().unionByName(dups.toDF()))
      .selectExpr("doc_id").as[Long].collect().toSet
    assert(admitted === batch, "streaming first-seen == batch min-id per fingerprint")
    assert(admitted.forall(_ < 1000000L), "every planted dup dropped")
    // the admitted fingerprint set is the full distinct-fingerprint set
    val keys = spark.read.parquet(out).select($"gate_key").as[String].collect().toSet
    val batchKeys = docs.toDF()
      .select(StreamingDedup.exactKey($"text").as("k")).as[String].collect().toSet
    assert(keys === batchKeys)
  }

  test("near-dup gate drops single-band collisions and agrees with the batch key") {
    val docs = baseDocs.take(50)
    // same token stream modulo punctuation/case → identical shingle
    // set → identical band signature, guaranteed collision
    val nearDups = docs.take(10).map(d =>
      SDoc(d.doc_id + 2000000L, d.text.toUpperCase + " !!!"))
    // shingle-less docs (< 3 tokens → zero 3-shingles) fall back to
    // the exact key: distinct content passes, identical normalized
    // content dedupes ("???" and "!!!" both normalize to "")
    val empties = Seq(SDoc(3000001L, "one"), SDoc(3000002L, "two"),
      SDoc(3000003L, "???"), SDoc(3000004L, "!!!"))
    val out = runGate(Seq(docs, nearDups ++ empties),
      df => StreamingDedup.nearDupGate(df, bandRows = 4, ttlMs = 0L))
    val admitted = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet

    assert(nearDups.forall(d => !admitted.contains(d.doc_id)),
      "identical-shingle near-dups are dropped")
    assert(admitted.contains(3000001L) && admitted.contains(3000002L),
      "distinct shingle-less docs both pass via the exact-key fallback")
    assert(Seq(3000003L, 3000004L).count(admitted.contains) === 1,
      "shingle-less docs with identical normalized content dedupe to one")
    // batch agreement: admitted keys == the distinct key set of the feed
    val all = (docs ++ nearDups ++ empties).toDF()
    val batchKeys = all
      .select(StreamingDedup.nearDupKey($"text", 4).as("k")).as[String].collect().toSet
    val streamedKeys = spark.read.parquet(out).select($"gate_key").as[String].collect().toSet
    assert(streamedKeys === batchKeys,
      "one admitted doc per distinct gate key, none missing")
  }

  test("multi-band gate recall on planted near-dups beats single-band, vs batch authority") {
    // Planted near-dups: delete ONE middle token from each long base
    // doc — kills ~3 of n shingles, J ≈ (n−5)/(n−2) ≈ 0.95 at 60+
    // tokens. Single-band catch ≈ J⁴ ≈ 0.8; 4 bands ≈ 1−(1−J⁴)⁴ ≈
    // 0.998. "Truth" = the docs the VERIFIED batch pass
    // (Dedup.minhashPairs) says are near-dups of their base — the
    // corpus-level authority the gate approximates.
    val docs = baseDocs.filter(_.text.split("\\s+").length >= 60).take(30)
    val planted = docs.map { d =>
      val toks = d.text.split("\\s+").toVector
      val mid = toks.length / 2
      SDoc(d.doc_id + 5000000L,
        (toks.take(mid) ++ toks.drop(mid + 1)).mkString(" "))
    }
    val truth = Dedup.minhashPairs((docs ++ planted).toDF(), threshold = 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .collect { case (a, b) if b == a + 5000000L => b }.toSet
    assert(truth.size >= 20,
      s"need enough true near-dups to measure recall, got ${truth.size}")
    def admitted(gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[StreamingDedup.KeyedDoc]): Set[Long] = {
      val out = runGate(Seq(docs, planted), gate)
      spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    }
    val multi = admitted(df =>
      StreamingDedup.nearDupGateMulti(df, bands = 4, bandRows = 4, ttlMs = 0L))
    val single = admitted(df =>
      StreamingDedup.nearDupGate(df, bandRows = 4, ttlMs = 0L))
    val recallMulti = truth.count(id => !multi.contains(id)).toDouble / truth.size
    val recallSingle = truth.count(id => !single.contains(id)).toDouble / truth.size
    info(f"gate recall vs batch authority (n=${truth.size}): " +
      f"single=$recallSingle%.2f multi=$recallMulti%.2f")
    // the driver corpus contains genuine near-dups among the base
    // docs — the gate rightly drops those; "no phantom collisions"
    // is only assertable for docs with no near-dup partner at all.
    // Partner detection runs at threshold 0.4, far below the gate's
    // design point: a sub-0.7 pair (J ≈ 0.5) still collides on one
    // of 4 bands with non-trivial probability, so "lone" must mean
    // no partner even at weak similarity (review-caught)
    val pairedBase = Dedup.minhashPairs(docs.toDF(), threshold = 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    val loneBase = docs.map(_.doc_id).toSet -- pairedBase
    assert(loneBase.subsetOf(multi),
      s"pair-free base docs must all be admitted; missing ${loneBase -- multi}")
    assert(recallMulti >= 0.9, f"multi-band gate recall $recallMulti%.2f < 0.9")
    assert(recallMulti >= recallSingle,
      "adding bands must not lose near-dups (union of band keys)")
  }

  test("replay safety: redelivery after restart is suppressed by checkpointed state") {
    val docs = baseDocs.take(30)
    val (ckpt, out) = (tmp(), tmp())
    // first delivery
    runGate(Seq(docs), df => StreamingDedup.dedupeExact(df, ttlMs = 0L), ckpt, out)
    assert(spark.read.parquet(out).count() === 30)
    // at-least-once redelivery: after a restart against the SAME
    // checkpoint, the source re-sends already-admitted rows AT NEW
    // OFFSETS (so offset tracking can't skip them — only the
    // recovered STATE can suppress them), mixed with a genuinely new
    // doc that must still be admitted. Two chunks: the first replays
    // the old offset range (skipped by offset recovery), the second
    // is the state-level redelivery under test.
    val fresh = SDoc(4000001L, "a genuinely new document about spark state stores")
    runGate(Seq(docs, docs.take(10) :+ fresh),
      df => StreamingDedup.dedupeExact(df, ttlMs = 0L), ckpt, out)
    val ids = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSeq
    assert(ids.length === 31, "replayed rows admitted exactly once, new doc admitted")
    assert(ids.distinct.length === 31)
    assert(ids.contains(4000001L))
  }

  test("corpus gate: stream-static probe drops verified corpus near-dups only") {
    import graft.operators.MinHashIndex
    val corpus = baseDocs.take(100)
    val index = MinHashIndex.build(corpus.toDF())
    // batch authority for "which stream docs have a corpus near-dup"
    def authority(stream: Seq[SDoc], threshold: Double): Set[Long] =
      MinHashIndex.probe(index, stream.toDF(), threshold)
        .select($"batch_id").as[Long].collect().toSet

    val nearDup = corpus.take(20).map(d =>
      SDoc(d.doc_id + 5000000L, d.text.replaceAll("\\b(\\w+)$", "altered")))
    val novel = Seq(
      SDoc(6000001L, "entirely novel content about distributed stream processing engines and their state stores"),
      SDoc(6000002L, "")) // shingle-less: no signal, must be admitted
    val stream = nearDup ++ novel
    val expectDropped = authority(stream, 0.7)
    assert(expectDropped.nonEmpty, "vacuous: no stream doc verifies against the corpus")
    assert(!expectDropped.contains(6000001L) && !expectDropped.contains(6000002L))

    val out = runGate(Seq(stream),
      df => StreamingDedup.corpusGate(df, index, threshold = 0.7))
    val admitted = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(admitted === stream.map(_.doc_id).toSet -- expectDropped,
      "gate verdicts must equal the batch probe's")
    assert(admitted.contains(6000001L) && admitted.contains(6000002L))
  }

  test("corpus gate verifies: band collisions below the Jaccard threshold are admitted") {
    import graft.operators.MinHashIndex
    val base = "the quick brown fox jumps over the lazy dog near the river bank every sunny morning in july watching boats"
    val index = MinHashIndex.build(Seq(SDoc(1L, base)).toDF())
    // ~J 0.75 vs base: collides on some band with p ≈ 1 − (1 − J³)¹⁶
    // ≈ 0.9998, but verifies BELOW threshold 0.9 — an unverified
    // gate would drop it, the verified gate must admit it
    val similar = SDoc(2L, base.replace("sunny morning", "rainy evening") + " happily")
    val j = Dedup.minhashPairs(Seq(SDoc(1L, base), similar).toDF(), threshold = 0.1)
      .select($"jaccard").as[Double].collect().headOption.getOrElse(0.0)
    assert(j > 0.5 && j < 0.9, s"fixture drift: exact jaccard $j outside (0.5, 0.9)")
    val out = runGate(Seq(Seq(similar)),
      df => StreamingDedup.corpusGate(df, index, threshold = 0.9))
    assert(spark.read.parquet(out).count() === 1, "sub-threshold collision admitted")
  }
}
