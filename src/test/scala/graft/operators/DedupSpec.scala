package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank every sunny morning in july"
  private val nearDup = base.replace("sunny", "rainy") // one-token change
  private val unrelated = "completely different content about databases indexes and query optimization at large scale"

  test("exact dedup keeps the min id per normalized fingerprint") {
    val docs = Seq(
      (10L, "Hello, World!"),
      (3L, "hello   world"), // same after normalization
      (7L, "something else")).toDF("doc_id", "text")
    val kept = Dedup.exact(docs).select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(3L, 7L))
  }

  test("shingles of short texts are empty, not garbage (sequence guard)") {
    val sh = Seq((1L, "one two"), (2L, "one two three four"))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).isEmpty)
    assert(sh(2L) === Seq("one two three", "two three four"))
  }

  test("ShingleHashesSeq: positional hashes line up with the distinct set") {
    import org.apache.spark.sql.functions.col
    val txt = "one two three one two three four five" // "one two three" repeats
    val df = Seq((1L, txt)).toDF("doc_id", "text")
    val seqH = df.select(org.apache.spark.sql.graft.ShingleHashesSeq(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().head
    val setH = df.select(org.apache.spark.sql.graft.ShingleHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().head
    assert(seqH.length === 6, "tokens - n + 1 positions, duplicates kept")
    assert(seqH.toSet === setH.toSet, "same hash per span as the distinct form")
    assert(seqH(0) === seqH(3), "repeated span hashes equal at both positions")
    // shorter than n: empty, not garbage
    val short = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(org.apache.spark.sql.graft.ShingleHashesSeq(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().head
    assert(short.isEmpty)
  }

  test("StripSpans: covers, clips, overlaps, and is identity on empty starts") {
    import org.apache.spark.sql.functions.{col, lit, array, typedLit}
    def strip(text: String, starts: Seq[Int], n: Int = 3): String =
      Seq((text, starts)).toDF("text", "starts")
        .select(org.apache.spark.sql.graft.StripSpans(col("text"), col("starts"), n).as("s"))
        .as[String].collect().head
    assert(strip("One, two THREE four five", Seq()) === "one two three four five",
      "empty starts = normalized identity")
    assert(strip("one two three four five", Seq(0)) === "four five")
    assert(strip("one two three four five", Seq(1)) === "one five")
    assert(strip("one two three four five", Seq(0, 1)) === "five", "overlap unions")
    assert(strip("one two three four five", Seq(4)) === "one two three four",
      "range past the end clips")
    assert(strip("one two three four five", Seq(-5, 99)) === "one two three four five",
      "out-of-range starts are inert")
    assert(strip("", Seq(0)) === "")
  }

  test("minhashPairs finds the planted near-dup and nothing else") {
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L)))
  }

  test("minhash jaccard matches the exact set jaccard") {
    val docs = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val jac = Dedup.minhashPairs(docs, threshold = 0.1)
      .select("jaccard").as[Double].collect().head
    // one token changed in an 18-token text: shingle overlap is high but < 1
    assert(jac > 0.5 && jac < 1.0)
  }

  test("dropNearDuplicates removes the higher id of a near-dup pair") {
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L))
  }

  test("simhashPairs finds the planted near-dup via chunk banding") {
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L)))
  }

  test("simhash is stable and sensitive: identical text → hamming 0") {
    val docs = Seq((1L, base), (2L, base), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 0)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0L)))
  }

  test("driver documents table: minhash recovers every >=0.7 ground-truth pair") {
    graft.GraftSession.tune(spark)
    val docs = graft.tables.Tables.documents(spark, sfSmoke)
    // ground truth via brute-force exact jaccard on the shingle sets
    val sh = docs.select($"doc_id", Dedup.shingles($"text").as("sh"))
      .filter(org.apache.spark.sql.functions.size($"sh") > 0)
    val a = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    import org.apache.spark.sql.functions._
    val truth = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")).cast("double"))
      .filter($"jaccard" >= 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = Dedup.minhashPairs(docs, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(found === truth)
  }

  test("driver documents table: prefix filtering equals the all-pairs ground truth exactly") {
    graft.GraftSession.tune(spark)
    val docs = graft.tables.Tables.documents(spark, sfSmoke)
    import org.apache.spark.sql.functions._
    val sh = docs.select($"doc_id", Dedup.shingles($"text").as("sh"))
      .filter(size($"sh") > 0)
    val truth = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
      .crossJoin(sh.select($"doc_id".as("id_b"), $"sh".as("sh_b")))
      .filter($"id_a" < $"id_b")
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")).cast("double"))
      .filter($"jaccard" >= 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = Dedup.prefixFilterPairs(docs, tNum = 7, tDen = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(found === truth)
  }

  test("prefix filtering keeps boundary pairs where float ceil would lose them") {
    // two docs sharing exactly J = 0.7: 7 shared of 10-shingle union.
    // a has 10 shingles (12 tokens), b has 7, all shared. J = 7/10.
    // the IEEE prefix bound ceil(0.7*10)=ceil(7.000000000000001)=8
    // would shorten a's prefix from 4 to 3 — the rational bound keeps 4.
    val shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    val a = (1L, shared + " x1 x2 x3")
    val b = (2L, shared)
    val pairs = Dedup.prefixFilterPairs(Seq(a, b).toDF("doc_id", "text"))
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0.7)))
  }

  test("native shingle strings equal the Column-pipeline specification on randomized texts") {
    import org.apache.spark.sql.functions._
    // the interpreted formulation ShingleStrings replaced, kept here
    // as the executable specification
    def spec(text: org.apache.spark.sql.Column, n: Int) = {
      val t = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
      when(size(t) < n, array().cast("array<string>")).otherwise(
        array_distinct(
          transform(sequence(lit(1), size(t) - lit(n - 1)),
            i => concat_ws(" ", slice(t, i, lit(n))))))
    }
    val rnd = new scala.util.Random(11)
    val alphabet = "ab1 .!攻AB-\t"
    val texts = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString))
    val df = texts.toDF("id", "text")
    for (n <- Seq(2, 3)) {
      val rows = df.select(
        Dedup.shingles($"text", n).as("native"),
        spec($"text", n).as("spec"))
        .as[(Seq[String], Seq[String])].collect()
      rows.zipWithIndex.foreach { case ((nat, sp), i) =>
        assert(nat === sp, s"n=$n text #$i: ${texts(i)._2.take(80)}")
      }
    }
  }

  test("nearDupClusters labels transitive chains with one component id (a~b~c with a!~c)") {
    // a~b and b~c exceed the threshold, a~c does NOT — the chain the
    // greedy dropper mishandles. Connected components must still put
    // all three in one cluster, labeled by the min id.
    val t = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val docA = t
    val docB = t.replace("echo", "zulu")            // J(a,b) ≈ 0.71
    val docC = docB.replace("oscar", "yankee")      // J(b,c) ≈ 0.71, J(a,c) ≈ 0.5
    val docs = Seq(
      (1L, docA), (2L, docB), (3L, docC),
      (9L, "completely different content about databases and indexes and planners"))
      .toDF("doc_id", "text")
    // sanity: the chain's middle pair set really is {ab, bc}
    val pairs = Dedup.minhashPairs(docs, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)))
    val clusters = Dedup.nearDupClusters(docs, threshold = 0.7)
      .as[(Long, Long)].collect().toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }
}
