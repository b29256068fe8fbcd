package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** [[InvertedIndex]]: persisted round-trip equivalence, boolean
  * semantics vs a brute-force text scan, and the layout property
  * that makes it an INDEX — term predicates push into the parquet
  * read and the range layout concentrates each term in few files.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = {
    graft.GraftSession.tune(spark)
    Tables.documents(spark, sfSmoke)
  }

  test("persisted index searches identically to the in-memory postings") {
    val dir = Files.createTempDirectory("graft-invidx").toString
    InvertedIndex.build(docs, dir)
    val fromDisk = InvertedIndex
      .search(InvertedIndex.load(spark, dir), Seq("spark", "window"))
      .as[(Long, Long)].collect().toSeq
    val inMem = InvertedIndex
      .search(InvertedIndex.postings(docs), Seq("spark", "window"))
      .as[(Long, Long)].collect().toSeq
    assert(fromDisk === inMem)
    assert(fromDisk.nonEmpty)
  }

  test("AND search equals the brute-force text scan") {
    val got = InvertedIndex.search(InvertedIndex.postings(docs),
      Seq("spark", "window", "data")).select("doc_id")
      .as[Long].collect().toSet
    val brute = docs.filter(
        array_contains(split(col("text"), " "), "spark") &&
        array_contains(split(col("text"), " "), "window") &&
        array_contains(split(col("text"), " "), "data"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture terms must match documents")
  }

  test("OR search unions the per-term matches") {
    val p = InvertedIndex.postings(docs)
    val or = InvertedIndex.search(p, Seq("spark", "vector"), requireAll = false)
      .select("doc_id").as[Long].collect().toSet
    val a = InvertedIndex.search(p, Seq("spark")).select("doc_id").as[Long].collect().toSet
    val b = InvertedIndex.search(p, Seq("vector")).select("doc_id").as[Long].collect().toSet
    assert(or === (a ++ b))
  }

  test("term lookups push into the parquet scan of the persisted index") {
    val dir = Files.createTempDirectory("graft-invidx2").toString
    InvertedIndex.build(docs, dir)
    val plan = InvertedIndex.search(InvertedIndex.load(spark, dir),
        Seq("spark", "window")).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("In(term") || plan.contains("EqualTo(term")),
      plan.take(1500))
  }

  test("range layout concentrates each term's postings in one file") {
    val dir = Files.createTempDirectory("graft-invidx3").toString
    InvertedIndex.build(docs, dir, numFiles = 8)
    // every term's postings must live in a single parquet file — the
    // property that turns a term filter into a point read
    val perTermFiles = spark.read.parquet(dir)
      .select(col("term"), input_file_name().as("f"))
      .groupBy("term").agg(countDistinct("f").as("nf"))
      .agg(max("nf")).head().getLong(0)
    assert(perTermFiles === 1L)
  }
}
