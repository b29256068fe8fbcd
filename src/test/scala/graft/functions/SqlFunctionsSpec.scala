package graft.functions

import graft.SparkSpec

/** The pure-SQL surface of the native expressions (registered by
  * GraftSession.tune / GraftExtensions).
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def sql1[T](q: String): T = {
    graft.GraftSession.tune(spark)
    spark.sql(q).collect().head.getAs[T](0)
  }

  test("json_is_valid is strict about trailing garbage in SQL") {
    assert(sql1[Boolean]("""SELECT json_is_valid('{"a": 1}')"""))
    assert(!sql1[Boolean]("""SELECT json_is_valid('{"a": 1}x')"""))
    assert(!sql1[Boolean]("SELECT json_is_valid('')"))
    assert(sql1[Boolean]("SELECT json_is_valid('42')"))
  }

  test("json_is_valid_object requires strict validity AND a top-level object") {
    assert(sql1[Boolean]("""SELECT json_is_valid_object('{"a": 1}')"""))
    assert(sql1[Boolean]("""SELECT json_is_valid_object('{"k": {"nested": [1]}}')"""))
    assert(sql1[Boolean]("SELECT json_is_valid_object('{}')"))
    assert(!sql1[Boolean]("""SELECT json_is_valid_object('{"a": 1}x')""")) // trailing garbage
    assert(!sql1[Boolean]("SELECT json_is_valid_object('42')"))   // valid, not object
    assert(!sql1[Boolean]("SELECT json_is_valid_object('[1]')"))  // valid, not object
    assert(!sql1[Boolean]("SELECT json_is_valid_object('')"))
    assert(!sql1[Boolean]("""SELECT json_is_valid_object('{"a": }')"""))
    // non-ASCII payload exercises the byte-level parser path
    assert(sql1[Boolean]("""SELECT json_is_valid_object('{"k": "héllo ✓"}')"""))
  }

  test("normalize_text: NFC + control strip + whitespace collapse + trim") {
    import org.apache.spark.sql.graft.NormalizeText
    assert(NormalizeText.normalize("cafe\u0301  du\tmonde\u0007!") === "caf\u00e9 du monde!")
    assert(NormalizeText.normalize("  leading and trailing\r\n") === "leading and trailing")
    assert(NormalizeText.normalize("already clean") === "already clean")
    assert(NormalizeText.normalize("") === "")
    assert(NormalizeText.normalize(" \t\r\n ") === "")       // all-whitespace → empty
    assert(NormalizeText.normalize("\u0000\u0007\u007f") === "") // all-control → empty
    assert(NormalizeText.normalize("a\u000bb\fc") === "a b c")   // VT/FF are whitespace
    // composed input is untouched; supplementary chars survive as pairs
    assert(NormalizeText.normalize("café") === "café")
    // control BETWEEN base and mark: strip-before-NFC composes it
    // (idempotence — output is a fixed point)
    assert(NormalizeText.normalize("e\u0007\u0301") === "\u00e9")
    assert(NormalizeText.normalize(
      NormalizeText.normalize("e\u0007\u0301")) === "\u00e9")
    val emoji = new String(Character.toChars(0x1F600))
    assert(NormalizeText.normalize(s"x $emoji y") === s"x $emoji y")
    // SQL registration path
    assert(sql1[String]("SELECT normalize_text('a  b\tc')") === "a b c")
  }

  test("simhash64 and cosine_similarity are callable from SQL") {
    val h1 = sql1[Long]("SELECT simhash64('the quick brown fox')")
    val h2 = sql1[Long]("SELECT simhash64('THE  quick   BROWN fox!')")
    assert(h1 === h2, "tokenizer normalizes case/whitespace")
    val sim = sql1[Double](
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D))")
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("top_k_by_score aggregates per group in SQL with score-desc id-asc order") {
    graft.GraftSession.tune(spark)
    Seq(("a", 1L, 0.5), ("a", 2L, 0.9), ("a", 3L, 0.9), ("a", 4L, 0.1),
        ("b", 5L, 0.7))
      .toDF("g", "id", "score").createOrReplaceTempView("scores_v")
    val rows = spark.sql("""
      SELECT g, nb.id, nb.score
      FROM (SELECT g, top_k_by_score(score, id, 2) AS tk
            FROM scores_v GROUP BY g)
      LATERAL VIEW explode(tk) AS nb
      ORDER BY g, nb.score DESC, nb.id""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // ties (2,0.9) vs (3,0.9) break by lower id; k=2 truncates
    assert(rows === Seq(("a", 2L, 0.9), ("a", 3L, 0.9), ("b", 5L, 0.7)))
  }

  test("mg_topk aggregates heavy hitters from SQL, estimate-desc key-asc order") {
    graft.GraftSession.tune(spark)
    // capacity 3 covers the 3 distinct keys => exact counts
    Seq(1L, 1L, 1L, 2L, 2L, 9L).toDF("k").createOrReplaceTempView("mg_v")
    val rows = spark.sql("""
      SELECT hh.key, hh.est
      FROM (SELECT mg_topk(k, 3) AS sk FROM mg_v)
      LATERAL VIEW explode(sk) AS hh""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 3L), (2L, 2L), (9L, 1L)))
  }

  test("json_object_keys: strict object gate, sorted distinct keys, NULL otherwise") {
    assert(sql1[scala.collection.Seq[String]](
      """SELECT json_keys_strict('{"zk": 1, "a": {"nested": 2}, "m": [1,2]}')""")
      === Seq("a", "m", "zk"))
    // duplicate keys collapse (from_json-to-map semantics)
    assert(sql1[scala.collection.Seq[String]](
      """SELECT json_keys_strict('{"a": 1, "a": 2}')""") === Seq("a"))
    // NULL for: trailing garbage, non-object top level, invalid JSON
    assert(sql1[scala.collection.Seq[String]](
      """SELECT json_keys_strict('{"a": 1}x')""") === null)
    assert(sql1[scala.collection.Seq[String]](
      "SELECT json_keys_strict('42')") === null)
    assert(sql1[scala.collection.Seq[String]](
      "SELECT json_keys_strict('[1, 2]')") === null)
    assert(sql1[scala.collection.Seq[String]](
      "SELECT json_keys_strict('{broken')") === null)
    assert(sql1[scala.collection.Seq[String]](
      "SELECT json_keys_strict('{}')") === Seq.empty)
  }

  test("tokens_in_set_count and lang_id are callable from SQL") {
    assert(sql1[Int](
      "SELECT tokens_in_set_count('The cat AND the dog', 'the,and')") === 3)
    assert(sql1[String]("SELECT lang_id('the cat is on the mat')") === "en")
    assert(sql1[String]("SELECT lang_id('zzz qqq')") === "und")
  }

  test("shingle_hashes / minhash_signature / simhash_buckets compose in SQL") {
    val sigLen = sql1[scala.collection.Seq[Long]](
      "SELECT minhash_signature(shingle_hashes('a b c d e f', 3), 8)").length
    assert(sigLen === 8)
    val buckets = sql1[scala.collection.Seq[Long]](
      "SELECT simhash_buckets(array(0.5F, -0.25F, 1.0F, 0.0F), 4, 3)")
    assert(buckets.length === 3)
  }

  test("degenerate inputs yield NULL, not sentinel collisions (SQL surface safety)") {
    // token-free text: an all-ones fingerprint would make every such
    // doc a 0-hamming "near-dup" of every other
    assert(spark.sql("SELECT simhash64('!!! ???')").collect().head.isNullAt(0))
    assert(spark.sql("SELECT simhash64('ab')").collect().head.getLong(0) != 0L)
    // empty shingle set: a [Long.MaxValue x k] signature would collide
    // in every LSH band with estimated Jaccard 1.0
    assert(spark.sql("SELECT minhash_signature(shingle_hashes('a b', 3), 8)")
      .collect().head.isNullAt(0))
    // mismatched vector lengths: a silent prefix score would feed
    // garbage into top-k ranking
    assert(spark.sql(
      "SELECT cosine_similarity(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D))")
      .collect().head.isNullAt(0))
    assert(spark.sql("SELECT vector_norm(array(CAST(NULL AS DOUBLE), 1.0D))")
      .collect().head.isNullAt(0))
  }

  test("json_is_valid accepts deep nesting and long numbers like Go json.Valid") {
    // Jackson's default read constraints (nesting 1000, number length
    // 1000) were rejecting these — Go, the documented reference, accepts
    val deep = "[" * 2000 + "]" * 2000
    assert(spark.sql(s"SELECT json_is_valid('$deep')").collect().head.getBoolean(0))
    val longNum = "1" + "0" * 1500
    assert(spark.sql(s"SELECT json_is_valid('$longNum')").collect().head.getBoolean(0))
    // beyond even Go's own nesting cap → invalid on both
    val tooDeep = "[" * 10001 + "]" * 10001
    assert(!spark.sql(s"SELECT json_is_valid('$tooDeep')").collect().head.getBoolean(0))
  }

  test("unscannable marker words fail loudly instead of silently never matching") {
    val ex = intercept[IllegalArgumentException] {
      spark.sql("SELECT tokens_in_set_count('any text', \"can't,the\")").collect()
    }
    assert(ex.getMessage.contains("can never match"))
    // fractional / null size literals are rejected, not truncated
    assertThrows[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', 2.9)").collect()
    }
    assertThrows[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', NULL)").collect()
    }
  }
}
