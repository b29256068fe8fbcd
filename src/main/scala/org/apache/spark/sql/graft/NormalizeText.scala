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
  *  1. non-whitespace control characters stripped: C0 except
  *     TAB/LF/VT/FF/CR (U+0000-08, U+000E-1F) plus DEL (U+007F);
  *  2. Unicode NFC composition (`java.text.Normalizer`) — an NFD
  *     sequence like `e` + U+0301 becomes the composed `é`, so
  *     byte-level dedup/fingerprinting sees one spelling (strip
  *     FIRST so a control between base and mark cannot hide a
  *     composable pair — see [[NormalizeText.normalize]]);
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

  /** Called from generated code.
    *
    * Order matters for IDEMPOTENCE (the contract
    * [[CollapseIdempotentCalls]] depends on, property-proven in
    * GraftOptimizationsSpec): controls are stripped BEFORE NFC. The
    * original NFC-first order was not a fixed point — stripping a
    * control that sat between a base char and a combining mark
    * created a newly-composable pair that only the NEXT application
    * composed (e.g. `e` + BEL + U+0301 → `e` + U+0301 → `é`), so
    * reapplying the normalizer changed bytes and destabilized
    * fingerprints. Whitespace collapse/trim after NFC cannot create
    * composable adjacencies (a space always survives between
    * collapsed runs, and NFC never composes across the start of
    * string), so the composed pipeline's output is a fixed point.
    */
  def normalize(s: String): String = {
    var hasControl = false
    var i = 0
    while (i < s.length && !hasControl) {
      if (isStrippedControl(s.charAt(i))) hasControl = true
      i += 1
    }
    val stripped =
      if (!hasControl) s
      else {
        val sb = new java.lang.StringBuilder(s.length)
        var j = 0
        while (j < s.length) {
          val c = s.charAt(j)
          if (!isStrippedControl(c)) sb.append(c)
          j += 1
        }
        sb.toString
      }
    val nfc =
      if (java.text.Normalizer.isNormalized(stripped, java.text.Normalizer.Form.NFC)) {
        stripped
      } else {
        java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
      }
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var k = 0
    while (k < nfc.length) {
      val c = nfc.charAt(k)
      if (isWs(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      k += 1
    }
    sb.toString
  }

  /** Column wrapper. */
  def apply(c: Column): Column =
    ExpressionUtils.column(NormalizeText(ExpressionUtils.expression(c)))
}
