/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Remove the tokens covered by n-token spans starting at the given
  * 0-based token positions, returning the surviving tokens
  * lowercase-joined by single spaces — the REMOVAL step of
  * substring-level dedup (Lee et al. 2021: repeated verbatim spans
  * are cut from the corpus, not just audited).
  *
  * Tokenization is the engine-wide `[a-z0-9]+`-of-lowercased
  * convention (byte-level ASCII fold, identical to
  * [[ShingleHashes.tokenHashList]]'s scan), so positions produced by
  * posexploding [[ShingleHashesSeq]] index THIS token sequence
  * exactly. Start positions may overlap or run past the end; covered
  * ranges are clipped to the token count. An EMPTY start array
  * returns the normalized (lowercased, space-joined) full token
  * sequence — the identity under this operator's output convention;
  * a NULL in either input propagates NULL (standard binary-expression
  * null semantics — callers coalesce an absent start list to
  * `array()`).
  *
  * Native expression rather than a Column pipeline because the
  * reconstruction (tokenize → mark covered ranges → join survivors)
  * would otherwise be an interpreted `transform`/`filter` chain over
  * per-doc arrays in a registered query's hot path.
  */
case class StripSpans(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType | IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_spans needs (string, array<int|long>), got ($l, $r)")
    }

  private lazy val startsAreInt: Boolean = right.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(text: Any, starts: Any): Any =
    StripSpans.compute(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], n, startsAreInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"org.apache.spark.sql.graft.StripSpans.compute($t, $s, $n, $startsAreInt)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): StripSpans =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "strip_spans"
}

object StripSpans {

  /** Called from generated code. One byte scan collects the
    * lowercased tokens; a boolean cover mask marks [s, s+n) per
    * start; survivors join with single spaces. NULL slots in the
    * start array are SKIPPED: ArrayData.getLong reads a null slot
    * as 0, which would silently cover tokens [0, n) that were never
    * flagged (review-caught) — a null position carries no cover
    * signal.
    */
  def compute(text: UTF8String, starts: ArrayData, n: Int,
              startsAreInt: Boolean): UTF8String = {
    val bytes = text.getBytes
    val tokens = new java.util.ArrayList[String]()
    val sb = new java.lang.StringBuilder()
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      val c: Int = if (i < bytes.length) bytes(i) & 0xff else -1
      val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
      val isTok = (lower >= 'a' && lower <= 'z') || (lower >= '0' && lower <= '9')
      if (isTok) {
        sb.append(lower.toChar)
        inTok = true
      } else if (inTok) {
        tokens.add(sb.toString)
        sb.setLength(0)
        inTok = false
      }
      i += 1
    }
    val m = tokens.size()
    val covered = new Array[Boolean](m)
    var s = 0
    while (s < starts.numElements()) {
      if (!starts.isNullAt(s)) {
        val start0 =
          if (startsAreInt) starts.getInt(s).toLong else starts.getLong(s)
        var p = math.max(0L, start0)
        val end = math.min(m.toLong, start0 + n)
        while (p < end) { covered(p.toInt) = true; p += 1 }
      }
      s += 1
    }
    val out = new java.lang.StringBuilder()
    var j = 0
    var first = true
    while (j < m) {
      if (!covered(j)) {
        if (!first) out.append(' ')
        out.append(tokens.get(j))
        first = false
      }
      j += 1
    }
    UTF8String.fromString(out.toString)
  }

  def apply(text: Column, starts: Column, n: Int): Column =
    ExpressionUtils.column(StripSpans(
      ExpressionUtils.expression(text), ExpressionUtils.expression(starts), n))
}
