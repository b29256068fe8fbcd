/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.util.{ArrayList => JArrayList, HashSet => JHashSet}

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct top-level keys of a STRICTLY valid JSON object, or
  * NULL when the input is not one (invalid JSON, trailing garbage,
  * scalar/array top level).
  *
  * One Jackson pass replaces the two the dynamic-schema overflow
  * query otherwise pays — `json_is_valid(props)` (strict Go
  * `json.Valid` gate) followed by `from_json(props, map<string,
  * string>)` just to take `map_keys` — plus the map materialization
  * per row. Values are skipped token-wise (`skipChildren`), never
  * materialized. Semantics of the pair it fuses:
  *  - strict whole-string validity (trailing garbage → NULL), as
  *    [[JsonIsValid]];
  *  - non-object top level → NULL, as map-mode `from_json`;
  *  - duplicate keys collapse (`from_json` builds a map), keys sort
  *    byte-wise as `sort_array` does.
  */
case class JsonObjectKeys(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    JsonObjectKeys.keys(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysCall = s"org.apache.spark.sql.graft.JsonObjectKeys.keys"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $keysCall($c.toString());
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): JsonObjectKeys =
    copy(child = newChild)

  // matches the SQL registration: Spark ships a BUILT-IN (lenient,
  // insertion-ordered) json_object_keys, and plan/SQL regeneration
  // printing that name would silently re-resolve to it
  override def prettyName: String = "json_keys_strict"
}

object JsonObjectKeys {
  // Go-parity read constraints — see JsonIsValid.goParityFactory
  private val factory = JsonIsValid.goParityFactory()

  /** Called from generated code; null = not a strict JSON object. */
  def keys(s: String): GenericArrayData =
    try {
      val p = factory.createParser(s)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        val seen = new JHashSet[String]()
        val out = new JArrayList[UTF8String]()
        var t = p.nextToken()
        while (t == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          if (seen.add(name)) out.add(UTF8String.fromString(name))
          p.nextToken() // move onto the value
          p.skipChildren() // and over it (containers consumed fully)
          t = p.nextToken()
        }
        if (t != JsonToken.END_OBJECT) return null
        if (p.nextToken() != null) return null // strict: no trailing tokens
        val arr = out.toArray(new Array[AnyRef](out.size()))
        java.util.Arrays.sort(arr) // UTF8String compareTo: byte-wise, = sort_array
        new GenericArrayData(arr)
      } finally p.close()
    } catch {
      case _: Exception => null
    }

  /** Column wrapper. */
  def apply(c: Column): Column =
    ExpressionUtils.column(JsonObjectKeys(ExpressionUtils.expression(c)))
}
