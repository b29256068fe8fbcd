/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.util.{LinkedHashSet => JLinkedHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token shingle STRINGS of a text, in one codegen'd pass.
  *
  * Same semantics as the Column pipeline
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, n))))` over `regexp_extract_all(lower(text),
  * '[a-z0-9]+')`: tokens are maximal ASCII `[a-z0-9]+` runs of the
  * lowercased text, shingles join n consecutive tokens with single
  * spaces, duplicates collapse keeping first-occurrence order, and
  * fewer than n tokens yields an empty array. The interpreted
  * higher-order-function formulation benched ~5 s per sf0.1 scan
  * (regex + per-shingle lambda allocation); this is one byte scan
  * plus exactly one String per distinct shingle.
  *
  * Sibling of [[ShingleHashes]] (which skips the strings entirely) —
  * use THIS only when the shingle text itself is the output, e.g.
  * corpus boilerplate reports.
  *
  * Known divergence (shared with [[ShingleHashes]]): lowercasing is
  * byte-level ASCII. The handful of non-ASCII codepoints whose FULL
  * Unicode lowercase is ASCII (U+212A KELVIN SIGN → 'k',
  * U+0130 'İ' → "i̇") tokenize under `lower()`+regex but are token
  * breaks here. No such codepoint appears in the oracle corpora;
  * callers needing exact Unicode parity should use the Column
  * pipeline this replaces.
  */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_strings needs string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleStrings.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)

  override def prettyName: String = "shingle_strings"
}

object ShingleStrings {

  /** Called from generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val toks = AsciiTokens.tokenize(text.getBytes)
    val m = toks.size()
    val out = new JLinkedHashSet[String]()
    var j = 0
    while (j + n <= m) {
      val b = new java.lang.StringBuilder()
      var q = 0
      while (q < n) {
        if (q > 0) b.append(' ')
        b.append(toks.get(j + q))
        q += 1
      }
      out.add(b.toString)
      j += 1
    }
    val arr = new Array[AnyRef](out.size())
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(arr)
  }

  /** Column wrapper. */
  def apply(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleStrings(ExpressionUtils.expression(text), n))
}
