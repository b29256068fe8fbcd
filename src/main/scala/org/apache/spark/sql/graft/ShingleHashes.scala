/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the n-token shingles of a text, in one
  * pass with zero intermediate strings.
  *
  * Semantics match the Column pipeline
  * `array_distinct(transform(shingles(text), xxhash64))` for MinHash
  * purposes: tokens are maximal `[a-z0-9]+` runs of the lowercased
  * text (ASCII fold — the tokenizer regex only admits ASCII anyway),
  * each shingle of n consecutive tokens maps to one 64-bit value, and
  * duplicates collapse. The hash VALUES differ from xxhash64 of the
  * joined string — irrelevant for MinHash/Jaccard, which only use
  * equality — in exchange for skipping ~shingle-count string
  * allocations per row; the Column form benched ~5 s per scan at
  * sf0.1 versus sub-second here.
  *
  * Known divergence (shared with [[ShingleStrings]], documented
  * there): lowercasing is byte-level ASCII, so the rare non-ASCII
  * codepoints whose full Unicode lowercase is ASCII (U+212A → 'k')
  * are token breaks here but tokens under `lower()`+regex.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes needs string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  private def fmix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
    x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  /** Called from generated code. One scan over the UTF-8 bytes:
    * rolling per-token hashes (ASCII-folded), shingle hash = mixed
    * combination of n consecutive token hashes, distinct via an open
    * HashSet.
    */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val tokenHashes = tokenHashList(text)
    val m = tokenHashes.size()
    val out = new JHashSet[java.lang.Long]()
    var j = 0
    while (j + n <= m) {
      var s = 0L
      var q = 0
      while (q < n) {
        s = fmix64(s ^ tokenHashes.get(j + q).longValue())
        q += 1
      }
      out.add(s)
      j += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(arr)
  }

  /** Called from generated code: ORDERED, NON-distinct shingle
    * hashes — element i is the hash of the shingle STARTING at token
    * position i (0-based), so `posexplode` recovers span positions.
    * Same tokenizer and hash chain as [[compute]]; the two must stay
    * in lockstep or positional span ops diverge from the distinct
    * MinHash surface.
    */
  def computeSeq(text: UTF8String, n: Int): GenericArrayData = {
    val tokenHashes = tokenHashList(text)
    val m = tokenHashes.size()
    val cnt = math.max(0, m - n + 1)
    val arr = new Array[Long](cnt)
    var j = 0
    while (j < cnt) {
      var s = 0L
      var q = 0
      while (q < n) {
        s = fmix64(s ^ tokenHashes.get(j + q).longValue())
        q += 1
      }
      arr(j) = s
      j += 1
    }
    new GenericArrayData(arr)
  }

  /** Shared single-pass token-hash scan (ASCII-folded `[a-z0-9]+`
    * runs → one rolling hash per token, in order).
    */
  private[graft] def tokenHashList(text: UTF8String): java.util.ArrayList[java.lang.Long] = {
    val bytes = text.getBytes
    val tokenHashes = new java.util.ArrayList[java.lang.Long]()
    var h = 0L
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val c: Int = if (i < bytes.length) bytes(i) & 0xff else -1
      val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok) {
        h = (h * 0x100000001b3L) ^ lower
        inTok = true
      } else if (inTok) {
        tokenHashes.add(fmix64(h))
        h = 0L
        inTok = false
      }
      i += 1
    }
    tokenHashes
  }

  /** Column wrapper. */
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(text), n))
}

/** [[ShingleHashes]]' positional sibling: ordered, NON-distinct —
  * element i is the 64-bit hash of the n-token shingle starting at
  * 0-based token position i, so `posexplode` yields (position, span
  * hash) pairs for span-level operators (duplicated-span removal).
  * Hash values are identical to [[ShingleHashes]]' for the same
  * span, so a distinct-set document frequency joins against these
  * positions directly.
  */
case class ShingleHashesSeq(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes_seq needs string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.computeSeq(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleHashes.computeSeq($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesSeq =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes_seq"
}

object ShingleHashesSeq {
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashesSeq(ExpressionUtils.expression(text), n))
}
