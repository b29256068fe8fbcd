package graft.functions

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GopherStats

import graft.SparkSpec

/** The native single-scan [[GopherStats]] must be BIT-EQUAL to the
  * relational HOF formulas it replaced (the same formulas the DuckDB
  * oracle runs) — checked on hand cases covering every rule edge and
  * on randomized documents.
  */
class GopherStatsSpec extends SparkSpec {
  import spark.implicits._

  /** The original HOF formulation, kept as the reference. */
  private def hofStats(df: DataFrame): DataFrame = {
    val w = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    val ln = split(col("text"), "\n")
    val stopArr = array(
      Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)
    df.select(
      col("id"),
      size(w).cast("long").as("n_words"),
      coalesce(
        aggregate(transform(w, x => length(x).cast("long")), lit(0L), _ + _),
        lit(0L)).as("sum_wlen"),
      (length(col("text")) - length(expr("replace(text, '#', '')")) +
        expr("(length(text) - length(replace(text, '...', ''))) div 3"))
        .cast("long").as("n_symbols"),
      size(ln).cast("long").as("n_lines"),
      size(filter(ln, l => ltrim(l).startsWith("- ") ||
        ltrim(l).startsWith("* ") || ltrim(l).startsWith("•")))
        .cast("long").as("n_bullet"),
      size(filter(ln, l => rtrim(l).endsWith("...") ||
        rtrim(l).endsWith("…"))).cast("long").as("n_ellipsis"),
      size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
      size(array_intersect(transform(w, x => lower(x)), stopArr)).cast("long")
        .as("n_stop"))
  }

  private def nativeStats(df: DataFrame): DataFrame =
    df.select(col("id"), GopherStats(col("text")).as("gs"))
      .select(col("id"), col("gs.*"))

  private def check(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val h = hofStats(df).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val nv = nativeStats(df).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    h.keys.toSeq.sorted.foreach { id =>
      assert(nv(id) === h(id),
        s"diverged on id $id: ${texts(id.toInt).take(80).replace("\n", "\\n")}")
    }
  }

  test("hand cases cover every rule edge") {
    check(Seq(
      "",
      " ",
      "the quick brown fox",
      "THE And thAt WITH of to be have",          // stop folding, distinct
      "a# ## #b ... .... ...... ..x",              // symbol counting edges
      "- bullet\n-nobullet\n* also\n• dot\n  - indented",
      "trails off ...\nends…\nnot...middle\nplain",
      "line with trailing spaces ...   \nnext",
      "12345 6789a _-- #",
      "tab\tsepvt\fff\rcr",
      "a\n\nb\n",                                   // empty lines, trailing LF
      "café あり word",               // non-ASCII words
      "...",
      "-",
      "- ",
      "the the the"))
  }

  test("supplementary chars count as ONE codepoint (DuckDB length parity)") {
    // the HOF reference used Spark length() = UTF-16 units (2 for an
    // emoji) — wrong against the DuckDB oracle's codepoint length;
    // the native scan counts codepoints, fixing the latent divergence
    val df = Seq((0L, new String(Character.toChars(0x1F600)))).toDF("id", "text")
    val r = nativeStats(df).collect().head
    assert(r.getAs[Long]("n_words") === 1L)
    assert(r.getAs[Long]("sum_wlen") === 1L)
  }

  test("randomized documents agree bit-for-bit") {
    val rnd = new Random(31)
    val alphabet = "ab E.#-*\n\t •…:;07"
    val texts = Seq.fill(300)(
      Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    check(texts)
  }

  test("doc_gopher_rules stays oracle-consistent after the swap (smoke)") {
    val rows = graft.queries.Queries.docGopherRules(spark, sfSmoke).collect()
    assert(rows.length > 500)
    // planted rows still land on their designed verdicts
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!byId(-1L).getAs[Boolean]("r_wordcount"))
    assert(!byId(-2L).getAs[Boolean]("r_symbol"))
    assert(!byId(-3L).getAs[Boolean]("r_bullet"))
    assert(!byId(-4L).getAs[Boolean]("r_ellipsis"))
    assert(!byId(-5L).getAs[Boolean]("r_alpha"))
    assert(!byId(-6L).getAs[Boolean]("r_stop"))
    assert(!byId(-7L).getAs[Boolean]("r_meanlen"))
    assert(byId(-8L).getAs[Boolean]("keep"))
  }
}
