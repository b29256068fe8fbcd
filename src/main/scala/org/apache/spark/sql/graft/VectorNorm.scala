/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Euclidean (L2) norm of a vector in double precision.
  *
  * Same accumulation contract as [[CosineSimilarity]]: strictly
  * sequential left-to-right sum of squares, then one `sqrt` — so the
  * value is bit-identical to the DuckDB oracle's
  * `sqrt(list_sum(list_transform(v, x -> x*x)))` on the same input.
  * Native for the same reason as its sibling: `aggregate()` lambdas
  * run interpreted; this is one fused codegen'd loop per row.
  */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_norm needs array<float|double>, got $other")
    }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // NULL for null elements (see compute)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    VectorNorm.compute(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Double ${ev.value}_r =
        org.apache.spark.sql.graft.VectorNorm.compute($a, $isFloat);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)

  override def prettyName: String = "vector_norm"
}

object VectorNorm {

  /** Called from generated code. NULL elements yield NULL — the
    * `sqrt(aggregate(...))` fold this documents parity with
    * propagates them, and reading one as 0.0 would silently shrink
    * the norm (same contract as [[CosineSimilarity.compute]]).
    */
  def compute(a: ArrayData, aFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  /** Column wrapper. */
  def apply(a: Column): Column =
    ExpressionUtils.column(VectorNorm(ExpressionUtils.expression(a)))
}
