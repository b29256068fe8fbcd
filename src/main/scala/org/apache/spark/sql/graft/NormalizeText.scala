/* Hosted under org.apache.spark.sql for private[sql] access — the
 * standard packaging for third-party native Catalyst expressions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_text(s)` — the standard pre-tokenization text
  * normalization gate of a training-data pipeline, in one codegen'd
  * pass:
  *
  *  1. Unicode NFC composition (`java.text.Normalizer`) — an NFD
  *     sequence like `e` + U+0301 becomes the composed `é`, so
  *     byte-level dedup/fingerprinting sees one spelling;
  *  2. non-whitespace control characters stripped: C0 except
  *     TAB/LF/VT/FF/CR (U+0000-08, U+000E-1F) plus DEL (U+007F);
  *  3. whitespace runs (space, TAB, LF, VT, FF, CR) collapse to one
  *     space;
  *  4. leading/trailing whitespace trimmed.
  *
  * Spark has no NFC built-in (DuckDB has `nfc_normalize`, which the
  * oracle uses) — hence a native expression rather than a function
  * composition. Deterministic and locale-independent; supplementary
  * characters pass through as surrogate pairs untouched.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"org.apache.spark.sql.graft.NormalizeText.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {

  @inline private def isStrippedControl(c: Char): Boolean =
    c <= 0x08.toChar || (c >= 0x0e.toChar && c <= 0x1f.toChar) ||
      c == 0x7f.toChar

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
      c == 0x0b.toChar || c == '\f'

  /** Called from generated code. */
  def normalize(s: String): String = {
    val nfc =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (isStrippedControl(c)) ()      // dropped entirely
      else if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Column wrapper. */
  def apply(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))
}
