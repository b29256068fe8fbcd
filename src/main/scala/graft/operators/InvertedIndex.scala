package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted (posting-list) index over a document corpus —
  * the search-engine primitive next to [[MinHashIndex]] (near-dup)
  * and [[IvfIndex]] (vectors): term → (doc_id, tf) postings written
  * as parquet SORTED BY TERM, so a keyword lookup is a
  * predicate-pushdown point read over the term column, never a text
  * scan.
  *
  * Scale shape: the build is one tokenize → explode → (term, doc)
  * aggregate (the same posting aggregate `doc_bm25` uses, persisted
  * instead of consumed); `repartitionByRange(term)` + within-file
  * sort give each parquet file a tight term min/max band, so a
  * search with N query terms prunes to the few files whose bands
  * cover them (row-group statistics do the rest). Search itself
  * filters postings by term, then resolves boolean AND via a
  * doc-keyed count — cost proportional to the MATCHED postings, not
  * the corpus.
  */
object InvertedIndex {

  /** Tokenize + count: one posting row per (term, doc). */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Build and persist the index. */
  def build(docs: DataFrame, dir: String, numFiles: Int = 8): Unit =
    postings(docs)
      .repartitionByRange(numFiles, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(dir)

  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Boolean keyword search over a postings table: docs matching
    * ALL (`requireAll=true`) or ANY of `terms`, scored by summed
    * term frequency. Deterministic total order: score desc, doc_id.
    */
  def search(index: DataFrame, terms: Seq[String],
             requireAll: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val matched = index.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_terms"),
        sum(col("tf")).as("score"))
    (if (requireAll) matched.filter(col("n_terms") === terms.distinct.length)
     else matched)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }
}
