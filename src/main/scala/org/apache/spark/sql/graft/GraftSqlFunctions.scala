/* Hosted under org.apache.spark.sql for private[sql] access
 * (sessionState, FunctionRegistry internals).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of graft's native expressions, so the pure-SQL
  * surface (`spark.sql`, JDBC/Thrift clients) can call them:
  *
  *  - `json_is_valid(s)` — strict whole-string JSON validity
  *  - `simhash64(s)` — 60-bit oracle-portable SimHash fingerprint
  *  - `cosine_similarity(a, b)` — fused double-precision cosine
  *  - `shingle_hashes(s, n)` — distinct n-token shingle hash set
  *  - `minhash_signature(hs, k)` — k-function MinHash signature
  *  - `simhash_buckets(vec, planes, tables)` — multi-table LSH keys
  *  - `top_k_by_score(score, id, k)` — bounded-heap per-group top-k
  *    aggregate (map-side k-heaps; see [[TopKByScore]])
  *  - `tokens_in_set_count(s, 'w1,w2,…')` — case-folded token-in-set
  *    count in one scan (see [[TokensInSetCount]])
  *  - `lang_id(s)` — single-scan heuristic language ID over the
  *    default marker lexicon (see [[LangIdOf]])
  *  - `json_keys_strict(s)` — sorted distinct top-level keys of a
  *    strictly-valid JSON object, NULL otherwise (distinct name: the
  *    built-in `json_object_keys` is lenient and insertion-ordered;
  *    see [[JsonObjectKeys]])
  *  - `vector_norm(v)` — fused double-precision L2 norm
  *  - `canonical_url(s)` / `url_host(s)` / `registered_domain(s)` —
  *    crawl-curation URL canonicalization (see [[UrlFunctions]])
  *  - `mg_topk(key, m)` — deterministic Misra-Gries heavy-hitters
  *    aggregate (see [[MisraGriesTopK]])
  *  - `window_funnel(ts, step, n, window)` — funnel chain-depth
  *    aggregate (see [[WindowFunnel]])
  *  - `gopher_stats(s)` — all Gopher quality-rule counts in one
  *    scan (see [[GopherStats]])
  *
  * Two wiring paths:
  *  - [[GraftExtensions]] for `spark.sql.extensions` at session
  *    build (the standard deploy-time config);
  *  - [[GraftSqlFunctions.register]] for a live session (what
  *    `GraftSession.tune` uses — the driver hands us sessions we
  *    didn't build).
  */
object GraftSqlFunctions {

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case null => throw new IllegalArgumentException(
        s"$what must be a non-NULL integer literal")
      case n: java.lang.Number =>
        val l = n.longValue()
        // reject silent truncation ('2.9' would run as 2) and overflow
        require(l.toDouble == n.doubleValue() && l.isValidInt,
          s"$what must be an integer, got $n")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got '$other'")
    }
  }

  private def longArg(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case null => throw new IllegalArgumentException(
        s"$what must be a non-NULL integer literal")
      case n: java.lang.Number =>
        val l = n.longValue()
        require(l.toDouble == n.doubleValue(), s"$what must be an integer, got $n")
        l
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got '$other'")
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("json_is_valid"),
      new ExpressionInfo(classOf[JsonIsValid].getName, "json_is_valid"),
      (es: Seq[Expression]) => JsonIsValid(es.head)),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (es: Seq[Expression]) => ShingleHashes(es(0), intArg(es(1), "shingle size"))),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0), intArg(es(1), "k"))),
    (FunctionIdentifier("simhash_buckets"),
      new ExpressionInfo(classOf[SimHashBuckets].getName, "simhash_buckets"),
      (es: Seq[Expression]) =>
        SimHashBuckets(es(0), intArg(es(1), "planes"), intArg(es(2), "tables"))),
    (FunctionIdentifier("shingle_strings"),
      new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
      (es: Seq[Expression]) => ShingleStrings(es(0), intArg(es(1), "shingle size"))),
    (FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (es: Seq[Expression]) =>
        TopKByScore(es(0), es(1), intArg(es(2), "k"))),
    (FunctionIdentifier("tokens_in_set_count"),
      new ExpressionInfo(classOf[TokensInSetCount].getName, "tokens_in_set_count"),
      (es: Seq[Expression]) => {
        require(es(1).foldable, "word list must be a literal")
        val lit = es(1).eval()
        require(lit != null, "word list must be a non-NULL comma-separated string")
        // trim around commas: the token scan can never emit a token
        // containing whitespace, so an untrimmed " and" would be a
        // silently dead marker
        val words = lit.toString.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        TokensInSetCount(es(0), words)
      }),
    (FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdOf].getName, "lang_id"),
      (es: Seq[Expression]) =>
        LangIdOf(es.head, graft.functions.TextFunctions.langMarkers)),
    // named json_keys_strict: Spark ships a BUILT-IN json_object_keys
    // (lenient parse, insertion order) that the idempotent register()
    // would otherwise defer to silently
    (FunctionIdentifier("json_keys_strict"),
      new ExpressionInfo(classOf[JsonObjectKeys].getName, "json_keys_strict"),
      (es: Seq[Expression]) => JsonObjectKeys(es.head)),
    (FunctionIdentifier("vector_norm"),
      new ExpressionInfo(classOf[VectorNorm].getName, "vector_norm"),
      (es: Seq[Expression]) => VectorNorm(es.head)),
    (FunctionIdentifier("json_is_valid_object"),
      new ExpressionInfo(classOf[JsonIsValidObject].getName, "json_is_valid_object"),
      (es: Seq[Expression]) => JsonIsValidObject(es.head)),
    (FunctionIdentifier("canonical_url"),
      new ExpressionInfo(classOf[CanonicalUrl].getName, "canonical_url"),
      (es: Seq[Expression]) => CanonicalUrl(es.head)),
    (FunctionIdentifier("url_host"),
      new ExpressionInfo(classOf[UrlHost].getName, "url_host"),
      (es: Seq[Expression]) => UrlHost(es.head)),
    (FunctionIdentifier("registered_domain"),
      new ExpressionInfo(classOf[RegisteredDomain].getName, "registered_domain"),
      (es: Seq[Expression]) => RegisteredDomain(es.head)),
    (FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
      (es: Seq[Expression]) => NormalizeText(es.head)),
    (FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[MisraGriesTopK].getName, "mg_topk"),
      (es: Seq[Expression]) =>
        MisraGriesTopK(es(0), intArg(es(1), "capacity m"))),
    (FunctionIdentifier("window_funnel"),
      new ExpressionInfo(classOf[WindowFunnel].getName, "window_funnel"),
      (es: Seq[Expression]) =>
        WindowFunnel(es(0), es(1), intArg(es(2), "nSteps"),
          longArg(es(3), "window"))),
    (FunctionIdentifier("gopher_stats"),
      new ExpressionInfo(classOf[GopherStats].getName, "gopher_stats"),
      (es: Seq[Expression]) => GopherStats(es.head)))

  /** Idempotent runtime registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}

/** `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftSqlFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => CollapseIdempotentCalls)
    // SQL UPDATE / MERGE INTO over snapshot tables (r17): post-hoc so
    // the engine's own resolution has bound every reference first —
    // the same slot Delta's PreprocessTableUpdate/Merge occupy
    ext.injectPostHocResolutionRule(_ => ResolveSnapshotDml)
    // readStream.table option pass-through (r18) — the DeltaAnalysis
    // shape: rewrite the streaming V2 relation over a snapshot table
    // into the V1 source WITH the reader options merged
    ext.injectResolutionRule(session => ResolveSnapshotStreaming(session))
    // maintenance statements (DESCRIBE HISTORY / OPTIMIZE / VACUUM /
    // RESTORE, r17) — the DeltaSqlParser shape: intercept the four
    // graft-only verbs, delegate everything else verbatim
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
