package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) join with 100%-recall candidate
  * blocking via the FastSS deletion neighborhood (Bocek et al.,
  * "Fast Similarity Search in Large Dictionaries", 2007 — public
  * technique).
  *
  * Why not all-pairs: a fuzzy join of an N-row probe set against an
  * M-row dictionary is N*M Levenshtein evaluations — at 100 TB scale
  * that is a cartesian product and a non-starter. The deletion
  * neighborhood gives an EXACT (provably recall-1) candidate filter
  * for distance <= 1:
  *
  *   For strings a, b with levenshtein(a, b) <= 1:
  *    - a == b: both neighborhoods contain the string itself;
  *    - one substitution at position i: deleting position i from
  *      both yields the same string;
  *    - one insertion/deletion: deleting the inserted character from
  *      the longer string yields the shorter, which is in its own
  *      neighborhood.
  *
  *   So candidates(a, b) ⊇ {(a, b) : levenshtein(a, b) <= 1} and the
  *   final `levenshtein <= 1` verify makes the join exact — unlike
  *   LSH blocking, no probabilistic recall caveat.
  *
  * Scale shape: each side explodes to (len+1) variant keys — a
  * linear blow-up, not quadratic — then an equi-join on the variant
  * hash shuffles only co-variant rows. Distinct-pair dedup happens
  * BEFORE the Levenshtein verify so each candidate pair is scored
  * once. The verify itself is Spark's codegen'd `levenshtein`.
  * Naive prefix blocking would collapse here (every dictionary entry
  * shares a long common prefix); the deletion neighborhood is
  * insensitive to shared affixes.
  */
object FuzzyJoin {

  /** The deletion-1 neighborhood of `s`: the string itself plus each
    * single-character-deletion variant, as an array column. Built
    * from codegen'd HOFs — no UDF.
    */
  def deletionNeighborhood(s: Column): Column = {
    // positions are 1-indexed; substring(s, i+1, big) takes the tail
    val variants = transform(
      sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), lit(1 << 20))))
    array_union(array(s), variants)
  }

  /** Join `probes(probeKey, probeStr)` to `dict(dictKey, dictStr)`
    * returning (probeKey, dictKey, dist) for every pair with
    * levenshtein(probeStr, dictStr) <= 1. Exact (recall 1) by the
    * neighborhood property above.
    */
  def joinWithin1(
      probes: DataFrame, probeKey: String, probeStr: String,
      dict: DataFrame, dictKey: String, dictStr: String): DataFrame = {
    // xxhash64 of the variant keeps the shuffle key fixed-width — the
    // join carries an 8-byte key instead of the variant string. A
    // hash collision can only ADD a candidate pair (removed by the
    // verify), never lose one, so exactness is preserved.
    val l = probes
      .select(col(probeKey), col(probeStr),
        explode(deletionNeighborhood(col(probeStr))).as("variant"))
      .select(col(probeKey), col(probeStr), xxhash64(col("variant")).as("vh"))
    val r = dict
      .select(col(dictKey), col(dictStr),
        explode(deletionNeighborhood(col(dictStr))).as("variant"))
      .select(col(dictKey), col(dictStr), xxhash64(col("variant")).as("vh"))
    l.join(r, "vh")
      .select(col(probeKey), col(probeStr), col(dictKey), col(dictStr))
      .distinct()
      .withColumn("dist", levenshtein(col(probeStr), col(dictStr)).cast("long"))
      .filter(col("dist") <= 1)
      .select(col(probeKey), col(dictKey), col("dist"))
  }
}
