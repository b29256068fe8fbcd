package graft

/** Driver-contract smoke: entry() returns rows, every query name has
  * a runnable plan, and every oracle key matches a query key.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  // near-orthogonal synthetic embeddings → the 0.95-cosine near-dup
  // search is correctly empty (the oracle agrees on the empty set)
  private val emptyOk = Set("emb_cosine_pairs")

  test("every registered query builds a plan and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfSmoke).count()
      if (!emptyOk(name)) assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
