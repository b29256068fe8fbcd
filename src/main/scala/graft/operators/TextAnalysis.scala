package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DataFrame-level text analysis operators (the Column-expression
  * variants live in [[graft.functions.TextFunctions]]).
  */
object TextAnalysis {

  /** Language ID as a relational plan: tokenize once → explode →
    * broadcast-hash-join against the marker dimension → count per
    * (doc, lang) → argmax with declaration-order tie-break.
    *
    * Semantics identical to [[TextFunctions.langId]], but the marker
    * lookup is a HASHED broadcast join instead of per-token linear
    * `array_contains` scans — the per-row expression form benched
    * 15 s at sf0.1 (tokens × markers × langs string compares,
    * interpreted higher-order functions); this form is one codegen'd
    * join + two partial-aggregated shuffles of (doc, lang) counts,
    * the shape that scales to 100 TB.
    *
    * @param docs (idCol, textCol) input
    * @return (idCol, lang_id) — "und" when no marker hits
    */
  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // marker dimension: token → (declaration index, code)
    val dim = TextFunctions.langMarkers.zipWithIndex.flatMap {
      case ((code, ms), idx) => ms.map(m => (m, idx, code))
    }.toDF("tok", "lang_idx", "code")

    val toks = docs.select(
      col(idCol),
      explode(TextFunctions.tokensLower(col(textCol))).as("tok"))

    val counts = toks
      .join(broadcast(dim), "tok") // inner join: non-marker tokens drop out
      .groupBy(col(idCol), col("lang_idx"), col("code"))
      .agg(count(lit(1)).as("hits"))

    // argmax(hits) with first-declared-wins ties: max of
    // (hits, -lang_idx) lexicographic struct, then unwrap the code.
    val best = counts
      .groupBy(col(idCol))
      .agg(max(struct(col("hits"), (-col("lang_idx")).as("neg_idx"),
        col("code"))).as("best"))
      .select(col(idCol), col("best.code").as("lang_id"))

    // docs with zero marker hits → "und"
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .withColumn("lang_id", coalesce(col("lang_id"), lit("und")))
  }
}
