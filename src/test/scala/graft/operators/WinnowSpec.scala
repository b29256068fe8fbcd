package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3
  private val w = 4

  /** Independent reference implementation: regex tokenizer, hex-string
    * md5 parse (the DuckDB formulation), naive window mins.
    */
  private def reference(text: String): Seq[Long] = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
    val shingles = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toVector
    if (shingles.size < w) return Seq.empty
    val md = MessageDigest.getInstance("MD5")
    val hashes = shingles.map { s =>
      val hex = md.digest(s.getBytes(StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    hashes.sliding(w).filter(_.size == w).map(_.min).toVector.distinct.sorted
  }

  private def winnow(texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(Dedup.winnowFingerprints($"text", n, w).as("fp"))
      .as[Seq[Long]].collect().toSeq

  test("fingerprints match the md5-hex reference implementation on fixed texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away",
      "one two three four five six", // exactly n+w-1 tokens: 1 window
      "one two three four five", // 3 shingles < w: empty
      "", "!!!", "ONE two THREE four FIVE six", // case-folded
      "a b c d e f a b c d e f a b c d e f") // repeated content
    winnow(texts).zip(texts).foreach { case (got, t) =>
      assert(got === reference(t), s"for: '$t'")
    }
  }

  test("fingerprints match the reference on random texts (property)") {
    val word = Gen.frequency(
      6 -> Gen.listOfN(3, Gen.alphaChar).map(_.mkString),
      2 -> Gen.oneOf("the", "and", "data", "42"),
      1 -> Gen.const("!@#"))
    val genText = Gen.choose(0, 40)
      .flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val texts = Gen.listOfN(150, genText)
      .pureApply(Gen.Parameters.default, Seed(7L))
    winnow(texts).zip(texts).foreach { case (got, t) =>
      assert(got === reference(t), s"for: '$t'")
    }
  }

  test("any shared run of >= w+n-1 tokens yields a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = w+n-1 tokens
    val a = s"unrelated prefix words here $shared and then some suffix"
    val b = s"completely different opening $shared closing differently too"
    val Seq(fa, fb) = winnow(Seq(a, b))
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
  }

  test("winnowPairs reports planted near-dups and honors the doc-frequency cap") {
    val base = "the training corpus needs careful deduplication before any " +
      "model ever sees a single token of it because repeated documents " +
      "bias the loss toward memorization and waste compute budget"
    val docs = Seq(
      (1L, base),
      (2L, base + " with a tiny suffix edit"),
      (3L, "entirely different text about cooking pasta with garlic and " +
        "olive oil on a slow flame until the kitchen smells wonderful right"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, minShared = 5, maxDf = 50)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))

    // maxDf = 1: every fingerprint the near-dup pair shares has doc
    // frequency 2 and is dropped, so no pair survives.
    val capped = Dedup.winnowPairs(docs, minShared = 1, maxDf = 1).count()
    assert(capped === 0L)
  }
}
