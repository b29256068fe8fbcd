/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimal open-addressing hash set of (pre-mixed) 64-bit keys.
  * Serializable so it can ride the codegen reference array to
  * executors. Keys are fmix64 outputs, so the low bits are already
  * uniform — the slot is just `key & mask`.
  */
final class LongHashSet(values: Iterable[Long]) extends Serializable {
  private val cap: Int = {
    var c = 8
    while (c < values.size * 3) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val full = new Array[Boolean](cap)
  values.foreach { v =>
    var i = v.toInt & mask
    while (full(i) && keys(i) != v) i = (i + 1) & mask
    keys(i) = v
    full(i) = true
  }

  def contains(v: Long): Boolean = {
    var i = v.toInt & mask
    while (full(i)) {
      if (keys(i) == v) return true
      i = (i + 1) & mask
    }
    false
  }
}

/** Single-pass tokenizer shared by [[TokensInSetCount]] and
  * [[LangIdOf]]: zero intermediate strings, tokens surface as mixed
  * 64-bit hashes (set membership only needs equality; with ≤300
  * marker words vs 64-bit hashes the collision probability is
  * ~1e-13 per corpus — see ShingleHashes for the same argument).
  *
  * Token grammar — [[TokenPattern]] is the regex equivalent, spliced
  * verbatim into the DuckDB oracle SQL:
  *  - maximal runs of lowercase ASCII alnum + Cyrillic (`[a-zа-яё0-9]+`)
  *    over the case-folded text, and
  *  - single CJK-ideograph / kana / hangul codepoints (no case, no
  *    word boundaries in those scripts — each char is a token).
  *
  * Case folding is per-codepoint ASCII (A-Z) + Cyrillic (А-Я, Ё);
  * this matches `lower()` + regex for those scripts. Same documented
  * divergence as [[ShingleHashes]]: exotic codepoints whose full
  * Unicode lowercase lands in a token class (U+212A KELVIN → 'k')
  * break tokens here but not under `lower()` — the corpus is ASCII
  * (verified each round), so counts are identical in practice.
  */
object TextTokens {

  /** Regex form of the token grammar, for Spark `regexp_extract_all`
    * over `lower(text)` and the DuckDB oracle. Ranges: CJK ideographs
    * U+4E00-U+9FFF, hiragana+katakana U+3040-U+30FF, hangul syllables
    * U+AC00-U+D7A3.
    */
  final val TokenPattern = "[a-zа-яё0-9]+|[一-鿿぀-ヿ가-힣]"

  private def fmix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
    x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  @inline private def roll(h: Long, cp: Int): Long =
    (h * 0x100000001b3L) ^ cp

  @inline private def lowerCp(cp: Int): Int =
    if (cp >= 'A' && cp <= 'Z') cp + 32
    else if (cp >= 0x0410 && cp <= 0x042F) cp + 0x20 // А-Я → а-я
    else if (cp == 0x0401) 0x0451 // Ё → ё
    else cp

  @inline private def isRun(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
      (cp >= 0x0430 && cp <= 0x044F) || cp == 0x0451

  @inline private def isSingle(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
      (cp >= 0xAC00 && cp <= 0xD7A3)

  /** Hash of one marker word under the same fold+roll as [[scan]] —
    * used to build the sets the scan probes.
    */
  def hashWord(w: String): Long = {
    var h = 0L
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      h = roll(h, lowerCp(cp))
      i += Character.charCount(cp)
    }
    fmix64(h)
  }

  /** True iff the scanner emits EXACTLY this word as one token — the
    * precondition for a marker to ever match. A word with a
    * non-token char ("can't", "naïve", a multi-char CJK compound)
    * hashes to a value [[scan]] can never emit: a silently dead
    * marker (review-caught) — callers validate with this and fail
    * loudly instead.
    */
  def isScannableWord(w: String): Boolean = {
    var n = 0
    var h = 0L
    scan(org.apache.spark.unsafe.types.UTF8String.fromString(w),
      new Sink { def token(x: Long): Unit = { n += 1; h = x } })
    n == 1 && h == hashWord(w)
  }

  trait Sink { def token(h: Long): Unit }

  @inline private def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80

  /** RFC 3629 second-byte range for each lead: overlong encodings
    * (C0/C1, E0 80-9F, F0 80-8F), surrogates (ED A0-BF), and
    * beyond-U+10FFFF (F4 90+, F5-FF) are all MALFORMED — decoding
    * them anyway can fabricate token chars (0xC1 0xB0 would decode
    * to 'p') that Java's decoder never produces.
    */
  @inline private def validSecond(b0: Int, b1: Int): Boolean = b0 match {
    case 0xE0 => b1 >= 0xA0 && b1 <= 0xBF
    case 0xED => b1 >= 0x80 && b1 <= 0x9F
    case 0xF0 => b1 >= 0x90 && b1 <= 0xBF
    case 0xF4 => b1 >= 0x80 && b1 <= 0x8F
    case _ => b1 >= 0x80 && b1 <= 0xBF
  }

  /** One pass over the UTF-8 bytes: decode, case-fold, emit each
    * token's mixed hash.
    *
    * Malformed input: any ill-formed sequence (bad lead, bad or
    * missing continuation, overlong, surrogate, > U+10FFFF) decodes
    * as a replacement char (token break) advancing ONE byte — the
    * same resynchronization Java's REPLACE decoder applies, so token
    * boundaries match the `lower()`+regex relational path even on
    * invalid UTF-8 (review-caught: consuming unvalidated bytes
    * swallowed a following token char, e.g. the 'a' in 0xC2 0x61).
    */
  def scan(text: UTF8String, sink: Sink): Unit = {
    val bytes = text.getBytes
    val n = bytes.length
    var h = 0L
    var inTok = false
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0xFFFD
      var sz = 1
      if (b0 < 0x80) cp = b0
      else if (b0 >= 0xC2 && b0 <= 0xDF && i + 1 < n && isCont(bytes(i + 1))) {
        cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F); sz = 2
      } else if (b0 >= 0xE0 && b0 <= 0xEF && i + 2 < n &&
          validSecond(b0, bytes(i + 1) & 0xff) && isCont(bytes(i + 2))) {
        cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); sz = 3
      } else if (b0 >= 0xF0 && b0 <= 0xF4 && i + 3 < n &&
          validSecond(b0, bytes(i + 1) & 0xff) &&
          isCont(bytes(i + 2)) && isCont(bytes(i + 3))) {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); sz = 4
      }
      cp = lowerCp(cp)
      if (isRun(cp)) {
        h = roll(h, cp)
        inTok = true
      } else {
        if (inTok) { sink.token(fmix64(h)); h = 0L; inTok = false }
        if (isSingle(cp)) sink.token(fmix64(roll(0L, cp)))
      }
      i += sz
    }
    if (inTok) sink.token(fmix64(h))
  }
}

/** Count of tokens of `child` present in a fixed word set — the
  * codegen'd replacement for the interpreted
  * `size(filter(tokens(text), t => array_contains(...)))` pipeline
  * (Spark's higher-order-function lambdas never enter whole-stage
  * codegen and benched ~4× slower on the quality-score hot path).
  * One static call per row, no token strings, no per-token array
  * scans — a hash-set probe per token.
  *
  * Matching is case-insensitive via the scanner's fold (callers no
  * longer pre-`lower()` the text).
  */
case class TokensInSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  {
    val dead = words.filterNot(TextTokens.isScannableWord)
    require(dead.isEmpty,
      s"word(s) ${dead.mkString("'", "', '", "'")} can never match: each must " +
        "tokenize to exactly one token (no punctuation/accents/compounds)")
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType

  @transient private lazy val set: LongHashSet =
    new LongHashSet(words.map(TextTokens.hashWord))

  override protected def nullSafeEval(input: Any): Any =
    TokensInSetCount.compute(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", set, classOf[LongHashSet].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TokensInSetCount.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokensInSetCount =
    copy(child = newChild)

  override def prettyName: String = "tokens_in_set_count"
}

object TokensInSetCount {

  private final class Counter(set: LongHashSet) extends TextTokens.Sink {
    var n = 0
    override def token(h: Long): Unit = if (set.contains(h)) n += 1
  }

  /** Called from generated code. */
  def compute(text: UTF8String, set: LongHashSet): Int = {
    val c = new Counter(set)
    TextTokens.scan(text, c)
    c.n
  }

  /** Column wrapper. */
  def apply(text: Column, words: Seq[String]): Column =
    ExpressionUtils.column(
      TokensInSetCount(ExpressionUtils.expression(text), words))
}

/** Marker lexicon for [[LangIdOf]]: one probe set per language, in
  * declaration order (which is also the tie-break order).
  */
final class LangLexicon(markers: Seq[(String, Seq[String])]) extends Serializable {
  markers.foreach { case (lang, ms) =>
    val dead = ms.filterNot(TextTokens.isScannableWord)
    require(dead.isEmpty,
      s"$lang marker(s) ${dead.mkString("'", "', '", "'")} can never match " +
        "(must tokenize to exactly one token)")
  }
  private val sets: Array[LongHashSet] =
    markers.map { case (_, ms) => new LongHashSet(ms.map(TextTokens.hashWord)) }.toArray
  private val codes: Array[String] = markers.map(_._1).toArray
  @transient private lazy val codesU8: Array[UTF8String] =
    codes.map(UTF8String.fromString)
  @transient private lazy val und: UTF8String = UTF8String.fromString("und")

  private final class Counts extends TextTokens.Sink {
    val n = new Array[Int](sets.length)
    override def token(h: Long): Unit = {
      var i = 0
      while (i < sets.length) {
        if (sets(i).contains(h)) n(i) += 1
        i += 1
      }
    }
  }

  /** Argmax of marker-hit counts; first-declared language wins ties
    * (strictly-greater replacement, the same semantics as the
    * `when(b.score > a.score, b).otherwise(a)` fold it replaces);
    * "und" when nothing hits.
    */
  def classify(text: UTF8String): UTF8String = {
    val c = new Counts
    TextTokens.scan(text, c)
    var best = -1
    var bestN = 0
    var i = 0
    while (i < c.n.length) {
      if (c.n(i) > bestN) { bestN = c.n(i); best = i }
      i += 1
    }
    if (best < 0) und else codesU8(best)
  }
}

/** Heuristic language ID as ONE codegen'd expression: a single token
  * scan probing every language's marker set, then argmax. Replaces
  * the per-language interpreted `filter`/`array_contains` score
  * columns (n_langs × tokens × markers string compares per row).
  */
case class LangIdOf(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  @transient private lazy val lex: LangLexicon = new LangLexicon(markers)

  override protected def nullSafeEval(input: Any): Any =
    lex.classify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langLexicon", lex, classOf[LangLexicon].getName)
    defineCodeGen(ctx, ev, c => s"$ref.classify($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdOf =
    copy(child = newChild)

  override def prettyName: String = "lang_id"
}

object LangIdOf {
  /** Column wrapper. */
  def apply(text: Column, markers: Seq[(String, Seq[String])]): Column =
    ExpressionUtils.column(LangIdOf(ExpressionUtils.expression(text), markers))
}
