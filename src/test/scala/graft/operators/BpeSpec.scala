package graft.operators

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{BpeMergeTable, BpeTokenCount}
import graft.SparkSpec

/** Trainer + apply-expression matrix for [[Bpe]]. The hand-worked
  * corpus is the standard BPE teaching example (hug/pug/pun/bun/hugs
  * with fixed frequencies): every merge below is verifiable with
  * pencil and paper, independent of the implementation.
  */
class BpeSpec extends SparkSpec {

  private def corpus(rows: (String, Int)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  // hug×10 pug×5 pun×12 bun×4 hugs×5
  // pair counts: (h,u)=15 (u,g)=20 (p,u)=17 (u,n)=16 (b,u)=4 (g,s)=5
  //  → merge 1: (u,g)  [20]
  // then (h,ug)=15 (p,ug)=5 (p,u)=12 (u,n)=16 (b,u)=4 (ug,s)=5
  //  → merge 2: (u,n)  [16]
  // then (h,ug)=15 (p,ug)=5 (p,un)=12 (b,un)=4 (ug,s)=5
  //  → merge 3: (h,ug) [15]
  // then (p,ug)=5 (p,un)=12 (b,un)=4 (hug,s)=5
  //  → merge 4: (p,un) [12]
  private lazy val teaching = corpus(
    ("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5))

  test("trainer reproduces the hand-computed merge sequence") {
    val m = Bpe.train(Bpe.wordFreqs(teaching), k = 4)
    assert(m.map(x => (x.left, x.right, x.merged)) === Seq(
      ("u", "g", "ug"), ("u", "n", "un"), ("h", "ug", "hug"), ("p", "un", "pun")))
    assert(m.map(_.rank) === Seq(1, 2, 3, 4))
    // id algebra: base chars are 2-hex, merges are mNN
    assert(m.head.leftId === "75" && m.head.rightId === "67")
    assert(m.map(_.mergedId) === Seq("m01", "m02", "m03", "m04"))
  }

  test("tie-break: equal counts resolve to the smallest (left, right) id pair") {
    // "ab"×3 and "cd"×3: (a,b) and (c,d) both count 3 → (a,b) wins
    // ('61 62' < '63 64'); then (c,d) is the only pair left
    val m = Bpe.train(Bpe.wordFreqs(corpus(("ab", 3), ("cd", 3))), k = 2)
    assert(m.map(x => (x.left, x.right)) === Seq(("a", "b"), ("c", "d")))
  }

  test("exhausted corpus pads with sentinel ranks that never match") {
    // single word "ab": merge 1 = (a,b); afterwards no pairs remain
    val m = Bpe.train(Bpe.wordFreqs(corpus(("ab", 2))), k = 3)
    assert(m.map(x => (x.left, x.right, x.merged)) === Seq(
      ("a", "b", "ab"), ("", "", ""), ("", "", "")))
    // sentinel ids are non-hex, so apply skips them structurally
    val table = new BpeMergeTable(
      m.map(x => Array(x.leftId, x.rightId, x.mergedId)).toArray)
    assert(table.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab cd")) === 3L)
  }

  test("apply expression: rank-order merges, case folding, token grammar") {
    val merges = Bpe.train(Bpe.wordFreqs(teaching), k = 4)
    val table = new BpeMergeTable(
      merges.map(x => Array(x.leftId, x.rightId, x.mergedId)).toArray)
    def count(s: String): Long =
      table.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(count("hug") === 1L)     // [hug]
    assert(count("hugs") === 2L)    // [hug, s]
    assert(count("pun") === 1L)     // [pun]
    assert(count("pug") === 2L)     // [p, ug]
    assert(count("bun") === 2L)     // [b, un]
    assert(count("HUG BUN") === 3L) // case-folds, two words
    assert(count("hug-pun") === 2L) // punctuation splits words
    assert(count("mug") === 2L)     // unseen word: [m, ug]
    assert(count("") === 0L)
    assert(count("...!") === 0L)
  }

  test("left-to-right within one merge: aaaa under (a,a) becomes [aa, aa]") {
    // hand-built table (not trainer output) to pin the pass semantics
    val table = new BpeMergeTable(Array(Array("61", "61", "m01")))
    def count(s: String): Long =
      table.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(count("aa") === 1L)
    assert(count("aaa") === 2L)  // [aa, a]
    assert(count("aaaa") === 2L) // [aa, aa]
  }

  test("expression runs distributed over a DataFrame inside codegen") {
    val merges = Bpe.train(Bpe.wordFreqs(teaching), k = 4)
    val out = teaching
      .select(col("doc_id"), BpeTokenCount(col("text"), merges).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    // 10·[hug] + 5·[p,ug] + 12·[pun] + 4·[b,un] + 5·[hug,s]
    assert(out === (10 * 1 + 5 * 2 + 12 * 1 + 4 * 2 + 5 * 2).toLong)
  }

  test("token ids: deterministic vocabulary, order preserved, count-consistent") {
    val merges = Bpe.train(Bpe.wordFreqs(teaching), k = 4)
    val table = new BpeMergeTable(
      merges.map(x => Array(x.leftId, x.rightId, x.mergedId)).toArray)
    def ids(s: String): Seq[Int] = {
      val a = table.tokenIds(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until a.numElements()).map(a.getInt)
    }
    // merges learned: 1=(u,g)->ug, 2=(u,n)->un, 3=(h,ug)->hug, 4=(p,un)->pun
    // vocab: a..z=0..25, 0..9=26..35, merge t=35+t
    assert(ids("hug") === Seq(38))               // [hug]=m03
    assert(ids("hugs") === Seq(38, 18))          // [hug, s]
    assert(ids("pug") === Seq(15, 36))           // [p, ug=m01]
    assert(ids("bun") === Seq(1, 37))            // [b, un=m02]
    assert(ids("HUG bun7") === Seq(38, 1, 37, 33)) // folds, splits, digit id
    assert(ids("") === Seq.empty)
    // id sequence length always equals the counted tokens
    for (s <- Seq("hug pug pun", "mug...z", "a1b2c3", "HUGS HUGS"))
      assert(ids(s).length ===
        table.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
  }

  test("BpeTokenIds runs distributed inside codegen; size equals BpeTokenCount") {
    import org.apache.spark.sql.graft.BpeTokenIds
    val merges = Bpe.train(Bpe.wordFreqs(teaching), k = 4)
    val mismatches = teaching
      .select(
        BpeTokenIds(col("text"), merges).as("ids"),
        BpeTokenCount(col("text"), merges).as("n"))
      .filter(size(col("ids")).cast("long") =!= col("n"))
      .count()
    assert(mismatches === 0L)
  }

  test("wordFreqs is the distributed corpus-sized stage (partial+final agg)") {
    val p = Bpe.wordFreqs(teaching).queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expect partial + final aggregation\n" + p.take(800))
  }
}
