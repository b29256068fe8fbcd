package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{LangIdOf, TextTokens, TokensInSetCount}

/** Text-analysis scalar functions for a training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (codegen'd, whole-stage-compatible) — no Scala UDFs in the hot
  * path. The set-membership counters (stopwords, language markers)
  * are native Catalyst expressions ([[TokensInSetCount]],
  * [[LangIdOf]]): Spark's higher-order-function lambdas
  * (`filter`/`transform`) run interpreted outside whole-stage
  * codegen and benched ~4× slower on the quality-score hot path.
  * Each function is a pure Column expression, so it fuses into
  * whatever scan/projection the caller builds and never forces a
  * shuffle or materialization by itself.
  */
object TextFunctions {

  /** Word tokens: maximal alphanumeric runs. Regex kept to character
    * classes shared by Java regex and RE2 so the DuckDB oracle can
    * reproduce it verbatim.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the usual cheap
    * proxy for LLM token budgeting when no tokenizer is shipped.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  def charCount(text: Column): Column = length(text)

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  def digitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0)))

  def upperCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Z]"), lit(0)))

  /** Mean token length in characters (0.0 for token-free text). */
  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0).cast("double"),
        (acc, t) => acc + length(t)) / size(ts).cast("double"))
  }

  /** English stopword list — public so the oracle SQL generator can
    * splice the identical list into the DuckDB query.
    */
  val enStopwordList: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "that", "this", "it", "as", "at", "by", "be", "are")
  private val enStopwords: Seq[String] = enStopwordList

  /** Count of tokens that are English stopwords. Case-insensitive:
    * the native scan folds case itself, so callers pass the raw text
    * (no pre-`lower()` projection needed).
    */
  def stopwordCount(text: Column): Column =
    TokensInSetCount(text, enStopwords)

  /** Composite quality score in [0,1] — the standard cheap heuristics
    * (C4/Gopher-style): penalize token-free, very short, digit- or
    * punctuation-heavy text; reward stopword presence.
    * Pure per-row double arithmetic: deterministic and
    * oracle-reproducible bit-for-bit.
    *
    * Stopword matching is case-folded inside the native scan, so
    * sentence-initial "The"/"A" count.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = greatest(charCount(text), lit(1)).cast("double")
    val stopRatio = when(nTok === 0.0, lit(0.0))
      .otherwise(stopwordCount(text).cast("double") / nTok)
    val digitRatio = digitCount(text).cast("double") / nChar
    val punctRatio = punctCount(text).cast("double") / nChar
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val raw = lit(0.4) * lenScore +
      lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)) +
      lit(0.15) * (lit(1.0) - least(digitRatio * lit(10.0), lit(1.0))) +
      lit(0.15) * (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0)))
    round(raw, 4)
  }

  /** Language-marker stopword lists for the n-gram-free heuristic
    * language ID: the top function words of each language.
    *
    * Constraints the token grammar imposes (see
    * [[org.apache.spark.sql.graft.TextTokens.TokenPattern]]):
    *  - Latin/Cyrillic markers must be ASCII or Cyrillic letters only
    *    (accented Latin letters — é, ã, ü, è — are token BREAKS, so a
    *    marker containing one would never match; pt/it/fr/es lists
    *    stay accent-free);
    *  - zh/ja/ko markers are SINGLE characters: those scripts
    *    tokenize one codepoint at a time (no word boundaries), so ja
    *    markers are the high-frequency hiragana particles and ko
    *    markers the high-frequency syllable blocks.
    *
    * Declaration order is the tie-break order (first listed wins);
    * appended languages therefore never change the classification of
    * text that scores zero on them.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "on",
      "was", "with", "as", "his", "he", "be", "at", "by", "had", "not",
      "are", "but", "from", "or", "have", "an", "they", "which", "you", "were"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit",
      "den", "von", "sie", "des", "auf", "im", "dem", "sich", "als", "auch",
      "es", "an", "werden", "aus", "er", "hat", "dass", "war", "eine", "wird"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que", "de", "un",
      "una", "del", "se", "por", "con", "no", "para", "su", "al", "lo",
      "como", "pero", "sus", "le", "ya", "o", "este", "porque", "cuando", "muy"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "que", "une", "des", "du",
      "de", "un", "il", "ne", "se", "ce", "pas", "pour", "qui", "vous",
      "sur", "par", "plus", "avec", "ou", "son", "au", "nous", "comme", "mais"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "这", "他",
      "们", "你", "就", "也", "都", "要", "会", "对", "说", "能"),
    "ru" -> Seq("и", "в", "не", "на", "я", "что", "он", "с", "как", "это",
      "по", "но", "она", "к", "у", "из", "его", "за", "то", "же",
      "вы", "мы", "был", "была", "о", "так", "для", "от", "они", "есть"),
    "pt" -> Seq("o", "os", "as", "do", "da", "dos", "das", "que", "um", "uma",
      "para", "com", "em", "no", "na", "por", "se", "mais", "como", "mas",
      "foi", "ele", "ela", "isso", "muito", "quando", "sobre", "entre", "depois", "anos"),
    "it" -> Seq("il", "lo", "gli", "di", "che", "per", "con", "non", "del", "della",
      "si", "da", "come", "anche", "ma", "sono", "alla", "nel", "questo", "hanno",
      "essere", "dei", "delle", "nella", "al", "ha", "sia", "dopo", "quando", "molto"),
    "ja" -> Seq("の", "に", "は", "を", "た", "が", "で", "て", "と", "し",
      "も", "な", "い", "か", "る", "す", "ん", "ま", "こ", "う"),
    "ko" -> Seq("이", "다", "는", "을", "를", "가", "에", "하", "고", "의",
      "지", "한", "서", "도", "은", "로", "기", "들", "어", "있"))

  /** Per-language marker-hit count — one native token scan probing a
    * hash set ([[TokensInSetCount]]), replacing the interpreted
    * `filter` + `array_contains` pipeline.
    */
  def langScore(text: Column, markers: Seq[String]): Column =
    TokensInSetCount(text, markers)

  /** Lowercase tokens: ASCII/Cyrillic alnum runs plus single
    * CJK/kana/hangul characters. The pattern is written with literal
    * characters so the identical string is valid in both Java regex
    * and RE2 — the DuckDB oracle runs it verbatim. Kept as the
    * relational tokenizer ([[graft.operators.TextAnalysis.langId]]
    * explodes it); the per-row scoring path uses the native scan
    * instead.
    */
  def tokensLower(text: Column): Column =
    regexp_extract_all(lower(text), lit(TextTokens.TokenPattern), lit(0))

  /** Heuristic language ID: argmax of marker-hit counts, in ONE
    * codegen'd expression (single token scan probing every
    * language's set). Ties are broken by [[langMarkers]] declaration
    * order (first language listed wins — strictly-greater
    * replacement), "und" (undetermined) when nothing hits.
    */
  def langId(text: Column): Column = LangIdOf(text, langMarkers)

  /** Canonical text normalization for fingerprinting: lowercase,
    * strip non-alphanumerics to single spaces, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** 128-bit content fingerprint of normalized text (md5 hex).
    * Collision-safe enough to use as an exact-dedup grouping key at
    * 100 TB (2^64 docs before birthday trouble), and reproducible in
    * any SQL engine.
    */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** 64-bit xxhash fingerprint — cheaper shuffle key when 64 bits
    * suffice (Spark-side only; not oracle-portable).
    */
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))
}
