/* Hosted under org.apache.spark.sql so the expression can implement
 * ImplicitCastInputTypes (AbstractDataType is private[sql]) and wrap
 * itself into a Column (ExpressionUtils is private[sql]) — the
 * standard packaging for third-party native Catalyst expressions.
 */
package org.apache.spark.sql.graft

import com.fasterxml.jackson.core.JsonFactory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Strict whole-string JSON validity — the semantics of Go's
  * `json.Valid(body)` (reference `publisher/internal/api/handler.go:74-78`).
  *
  * Spark's own JSON path (Jackson in `from_json`, and
  * `try_parse_json` too) ACCEPTS trailing garbage such as `{"a":1}x`,
  * which the reference rejects with 400. No built-in expresses
  * "exactly one JSON value, then end of input", so this is a native
  * Catalyst `UnaryExpression` with `doGenCode` — it stays inside
  * whole-stage codegen (one static call per row, no UDF
  * encode/decode overhead).
  */
case class JsonIsValid(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    JsonIsValid.isValid(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.JsonIsValid.isValid($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): JsonIsValid =
    copy(child = newChild)

  override def prettyName: String = "json_is_valid"
}

object JsonIsValid {
  /** Jackson's default StreamReadConstraints (nesting 1000, number
    * length 1000) reject inputs the Go `json.Valid` reference accepts
    * (review-caught) — raise them to Go's semantics: nesting capped
    * at 10000 (encoding/json's own limit), scalars unbounded.
    */
  private[graft] def goParityFactory(): JsonFactory = {
    // new JsonFactory + setter (the builder's Java wildcard generics
    // don't cross into Scala cleanly)
    val f = new JsonFactory()
    f.setStreamReadConstraints(
      com.fasterxml.jackson.core.StreamReadConstraints.builder()
        .maxNestingDepth(10000)
        .maxNumberLength(Integer.MAX_VALUE)
        .maxStringLength(Integer.MAX_VALUE)
        .build())
    f
  }

  private val factory = goParityFactory()

  /** True iff `s` is exactly one complete JSON value (object, array,
    * string, number, boolean, or null) with nothing after it.
    */
  def isValid(s: String): Boolean =
    try {
      val p = factory.createParser(s)
      try {
        if (p.nextToken() == null) return false // empty input
        p.skipChildren()                        // consume the full first value
        p.nextToken() == null                   // strict: no trailing tokens
      } finally p.close()
    } catch {
      case _: Exception => false
    }

  /** Byte-level twin of [[isValid]] with an object-only gate: exactly
    * one complete JSON OBJECT, nothing after it. Parses the UTF-8
    * bytes directly (Jackson's byte parser) — no UTF8String → String
    * UTF-16 conversion on the hot path. This is precisely
    * `from_json`-against-a-struct-schema corruption ∪ strict-validity
    * failure, which lets the ingest admission filter decide
    * accept/reject in ONE streaming pass with no `from_json` in the
    * predicate (see [[graft.operators.IngestPipeline.parse]]).
    */
  def isValidObject(u: UTF8String): Boolean =
    try {
      val b = u.getBytes
      val p = factory.createParser(b, 0, b.length)
      try {
        if (p.nextToken() != com.fasterxml.jackson.core.JsonToken.START_OBJECT)
          return false
        p.skipChildren()
        p.nextToken() == null
      } finally p.close()
    } catch {
      case _: Exception => false
    }

  /** Column wrapper. */
  def apply(c: Column): Column =
    ExpressionUtils.column(JsonIsValid(ExpressionUtils.expression(c)))
}

/** `json_is_valid_object(s)` — strict whole-string validity AND the
  * top-level value is an object. One streaming Jackson pass over the
  * raw UTF-8 bytes; native codegen like [[JsonIsValid]].
  */
case class JsonIsValidObject(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    JsonIsValid.isValidObject(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.JsonIsValid.isValidObject($c)")

  override protected def withNewChildInternal(newChild: Expression): JsonIsValidObject =
    copy(child = newChild)

  override def prettyName: String = "json_is_valid_object"
}

object JsonIsValidObject {
  def apply(c: Column): Column =
    ExpressionUtils.column(JsonIsValidObject(ExpressionUtils.expression(c)))
}
