/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003 — the MOSS algorithm): hash every n-token shingle,
  * slide a w-shingle window over the hash sequence, keep each
  * window's minimum. Guarantees any shared run of ≥ w+n−1 tokens
  * between two documents yields a shared fingerprint, while storing
  * only ~2/(w+1) of the shingle hashes — the deterministic
  * counterpart to MinHash for substring-match detection.
  *
  * Tokens are the same maximal ASCII `[a-z0-9]+` runs of the
  * byte-lowercased text as [[ShingleStrings]] (same documented
  * non-ASCII divergence). The shingle hash is the TOP 60 BITS OF MD5
  * of the space-joined shingle — exactly
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB, so the
  * oracle reproduces fingerprint *selection* bit-for-bit (the same
  * portable-hash trick as the LSH hyperplanes). The classic
  * rightmost-min tie rule only reduces the fingerprint *count*; the
  * selected *values* under plain min are identical after the
  * distinct, which is what a SQL window `min` mirrors.
  *
  * Output: ascending distinct window minima, empty when the text has
  * fewer than n+w−1 tokens (no full window). One codegen'd pass per
  * row — no explode, no shuffle; md5 per shingle dominates and is
  * embarrassingly parallel scalar work.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints needs string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WinnowFingerprints.compute($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {

  /** Called from generated code. */
  def compute(text: UTF8String, n: Int, w: Int): GenericArrayData = {
    val toks = AsciiTokens.tokenize(text.getBytes)
    val m = toks.size()
    val nShingles = m - n + 1
    if (nShingles < w) return new GenericArrayData(new Array[Any](0))

    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](nShingles)
    var j = 0
    while (j < nShingles) {
      val b = new java.lang.StringBuilder()
      var q = 0
      while (q < n) {
        if (q > 0) b.append(' ')
        b.append(toks.get(j + q))
        q += 1
      }
      val d = md.digest(b.toString.getBytes(StandardCharsets.UTF_8))
      // First 15 hex chars of the digest = top 60 bits: bytes 0-6
      // whole, then the high nibble of byte 7. Always non-negative.
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      hashes(j) = v
      j += 1
    }

    // Full windows only: minima of hashes[e-w+1 .. e] for e ≥ w-1,
    // distinct and ascending.
    val out = new java.util.TreeSet[java.lang.Long]()
    var e = w - 1
    while (e < nShingles) {
      var mn = hashes(e)
      var p = e - w + 1
      while (p < e) {
        if (hashes(p) < mn) mn = hashes(p)
        p += 1
      }
      out.add(mn)
      e += 1
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(arr)
  }

  /** Column wrapper. */
  def apply(text: Column, n: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowFingerprints(ExpressionUtils.expression(text), n, w))
}
