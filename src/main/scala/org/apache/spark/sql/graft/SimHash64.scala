/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash document fingerprint.
  *
  * Tokens are maximal `[a-z0-9]+` runs of the lowercased text (ASCII
  * fold, same tokenizer as the rest of the text stack). Each token
  * hashes to 60 bits — the LOW 60 bits of the first 15 hex chars of
  * `md5(token)` — and each bit position accumulates +1/-1 across
  * tokens; the sign of each accumulator is the fingerprint bit.
  *
  * 60 bits and md5 (rather than 64/xxhash) keep the fingerprint
  * ORACLE-PORTABLE: DuckDB reproduces the token hash as
  * `('0x' || substr(md5(t), 1, 15))::BIGINT` and the whole simhash
  * with a bit-position cross join — so near-dup results can be
  * hash-verified against ground truth, unlike opaque hash families.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs string, got $other")
    }

  // NULL for token-free input (see compute) on top of null-in/null-out
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = org.apache.spark.sql.graft.SimHash64.compute($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  val bits = 60

  /** Low 60 bits of the first 15 hex chars of md5(token) — matches
    * DuckDB `('0x' || substr(md5(t), 1, 15))::BIGINT`.
    */
  def tokenHash(token: String): Long =
    tokenHash(token, MessageDigest.getInstance("MD5"))

  /** `md` is reset implicitly by digest(); hoisting it out of the
    * per-token path avoids a synchronized JCA provider lookup per
    * token of every document (review-caught; the WinnowFingerprints
    * sibling already reuses one digest per row).
    */
  private def tokenHash(token: String, md: MessageDigest): Long = {
    val digest = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7 bytes + high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) {
      h = (h << 8) | (digest(i) & 0xffL)
      i += 1
    }
    (h << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  /** Called from generated code. Returns NULL for token-free text: a
    * fingerprint over zero features would be the all-ones ties value
    * for EVERY such doc, making them all 0-hamming "near-dups" of
    * each other (review-caught; callers that pre-filter keep working,
    * the SQL surface is now safe by itself).
    */
  def compute(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    val acc = new Array[Int](bits)
    val sb = new java.lang.StringBuilder(16)
    val md = MessageDigest.getInstance("MD5")
    var nTokens = 0
    var i = 0
    while (i <= bytes.length) {
      val c: Int = if (i < bytes.length) bytes(i) & 0xff else -1
      val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok) {
        sb.append(lower.toChar)
      } else if (sb.length() > 0) {
        val h = tokenHash(sb.toString, md)
        nTokens += 1
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        sb.setLength(0)
      }
      i += 1
    }
    if (nTokens == 0) return null
    var out = 0L
    var b = 0
    while (b < bits) {
      if (acc(b) >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** Column wrapper. */
  def apply(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))
}
