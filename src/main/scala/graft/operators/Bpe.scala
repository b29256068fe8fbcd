package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-table TRAINING over a document corpus —
  * the missing first-class LLM-tokenization operator (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"): repeatedly count adjacent symbol pairs over the corpus
  * and merge the most frequent pair, yielding an ordered merge table
  * that [[org.apache.spark.sql.graft.BpeTokenCount]] then applies as
  * a native expression.
  *
  * Scale shape (the part that matters at 100 TB): training runs on
  * the WORD-FREQUENCY table, not the corpus — one distributed
  * scan+shuffle aggregates (word, freq), the iterative merge loop
  * then runs on the bounded top-V distinct words collected to the
  * driver. This is how production BPE trainers work (corpus-size
  * independent after the first pass); V bounds driver memory the
  * same way the IVF centroid collect does. The merge loop itself is
  * O(V · avg_word_len · K) — microseconds at any corpus size.
  *
  * Symbols are tracked as fixed-format IDS, not strings: base chars
  * encode as 2-char lowercase hex of their ASCII code ('a' → "61"),
  * the rank-t merge output as "m%02d" (t ≤ 99 by construction —
  * [[Bpe.MaxMerges]]). Content-based comparison would conflate two
  * merge paths that happen to produce the same text (e.g. (a,bc) and
  * (ab,c) both yielding "abc"); ids keep the algebra exact, and give
  * the DuckDB oracle a closed form: encode each word as
  * `|id|id|...`, then each merge is ONE sequential `replace(e,
  * '|L|R', '|M')` — exactly equivalent to the rank-greedy BPE apply
  * because a replacement can only create pairs involving the fresh
  * id M, never a new (L, R) occurrence.
  *
  * Token grammar: maximal `[A-Za-z0-9]+` runs, ASCII-lowercased —
  * deliberately simpler than [[org.apache.spark.sql.graft.TextTokens]]
  * (BPE operates on a byte/char alphabet; the per-script token rules
  * live upstream of tokenizer training).
  */
object Bpe {

  /** Merge ranks are formatted "m%02d" — two digits. */
  val MaxMerges = 99

  /** Default merge-table size for the registered queries: enough to
    * produce multi-level merges (merges of merges) on the test
    * corpus while keeping the oracle's generated SQL readable. */
  val DefaultMerges = 8

  /** Driver-collect bound for the word-frequency table. */
  val DefaultTopWords = 65536

  /** One learned merge: ids are the exact algebra, the decoded
    * strings the human-readable output. A rank where no pair
    * remained anywhere in the corpus is a SENTINEL (empty strings,
    * ids "zz" — no hex id, so it can never match) so the output
    * arity stays fixed at K for the oracle. */
  case class Merge(rank: Int, leftId: String, rightId: String,
      mergedId: String, left: String, right: String, merged: String)

  private[graft] def charId(c: Char): String = f"${c.toInt}%02x"
  private[graft] def mergeId(rank: Int): String = f"m$rank%02d"

  /** Distributed (word, freq) aggregate — the only corpus-sized
    * stage: one scan, one shuffle on word, partial+final counts. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs
      .select(explode(expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).as("w"))
      .select(lower(col("w")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Greedy merge training on the bounded word-frequency table.
    * Deterministic: ties break on smallest `"L R"` id string (space
    * sorts below every id char, so this equals (L, R) lexicographic
    * pair order — and is what the DuckDB oracle's `ORDER BY
    * sum(freq) DESC, pr` mirrors byte for byte). */
  def train(freqs: DataFrame, k: Int = DefaultMerges,
      topV: Int = DefaultTopWords): Seq[Merge] = {
    require(k >= 1 && k <= MaxMerges, s"merge count $k outside 1..$MaxMerges")
    val rows = freqs
      .orderBy(col("freq").desc, col("word"))
      .limit(topV)
      .collect()
    var words: Array[(Array[String], Long)] = rows.map { r =>
      (r.getString(0).toCharArray.map(charId), r.getLong(1))
    }
    val decode = scala.collection.mutable.Map.empty[String, String]
    rows.foreach(_.getString(0).foreach(c => decode(charId(c)) = c.toString))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    while (rank <= k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, freq) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + freq
      if (counts.isEmpty) {
        merges += Merge(rank, "zz", "zz", mergeId(rank), "", "", "")
        decode(mergeId(rank)) = ""
      } else {
        val ((l, r), _) = counts.minBy { case ((l, r), c) => (-c, l + " " + r) }
        val m = mergeId(rank)
        decode(m) = decode(l) + decode(r)
        merges += Merge(rank, l, r, m, decode(l), decode(r), decode(m))
        words = words.map { case (syms, freq) =>
          (applyMerge(syms, l, r, m), freq)
        }
      }
      rank += 1
    }
    merges.result()
  }

  /** One left-to-right pass merging every (l, r) adjacency — the
    * full application of one merge (a second pass could only find
    * pairs involving the fresh id m, which (l, r) is not). Public:
    * [[org.apache.spark.sql.graft.BpeMergeTable]] reuses it so the
    * trainer and the apply expression share one definition. */
  def applyMerge(syms: Array[String], l: String, r: String,
      m: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += m; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The merge table as a DataFrame (rank, lhs, rhs, merged). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.merged))
      .toDF("rank", "lhs", "rhs", "merged")
  }
}
