package graft.queries

/** Shared oracle-SQL fragments with NO references back into
  * [[Queries]] or [[QueriesOps]]. Both of those objects hold
  * init-time `val`s that reference each other's registries
  * (`Queries.all ++ QueriesOps.all`), so a shared fragment MUST live
  * outside the pair: a `val` in either one that forces the other at
  * init creates a cycle where whichever object is touched first sees
  * the other's not-yet-assigned fields as null
  * (review r12 — `QueriesOps.pqCte -> Queries.embFiniteCte ->
  * Queries.<init> -> QueriesOps.all == null` NPE'd any entry point
  * that touched QueriesOps before Queries).
  */
object OracleCtes {

  /** Oracle-side mirror of [[graft.tables.Tables.embeddingsFinite]]:
    * the `emb` CTE drops vectors that are NULL, carry a NULL or
    * non-finite component, or whose length differs from the declared
    * model dimension ([[graft.tables.Tables.EmbeddingDim]] — the dim
    * every oracle's fixed `range(1, 65)` indexing assumes). Every
    * similarity / clustering / quantization oracle reads `emb` so
    * both engines exclude corrupt vectors at the same boundary —
    * without this, DuckDB errors casting NaN to integral types, the
    * two engines rank NaN-similarity rows by their own (different)
    * total orders, and a ragged vector makes them count different
    * component sets. The `x IS NULL` arm matters: DuckDB's
    * `NOT isfinite(NULL)` is NULL (not true), so without it a
    * NULL-component vector would be kept by the oracle while Spark's
    * three-valued `exists` drops it.
    */
  val embFinite: String =
    s"emb AS (SELECT * FROM embeddings WHERE len(embedding) = ${graft.tables.Tables.EmbeddingDim} " +
      "AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0)"
}
