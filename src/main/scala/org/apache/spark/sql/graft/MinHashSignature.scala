/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-function MinHash signature over a set of 64-bit element hashes.
  *
  * The i-th hash function is `fmix64(h ^ seed_i)` (the murmur3
  * finalizer — a full-avalanche bijection, so each seed yields an
  * independent-enough permutation of the hash space). One tight
  * k × n long loop per row; the equivalent Column formulation
  * (k × `array_min(transform(...))`) runs interpreted and dominated
  * the near-dup bench.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<bigint>, got $other")
    }

  // NULL for empty input sets (see compute)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        org.apache.spark.sql.graft.MinHashSignature.compute($c, $k);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  /** Deterministic per-function seeds (splitmix64 of the index). */
  private def seed(i: Int): Long = {
    var z = i.toLong * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fmix64(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
    x = (x ^ (x >>> 33)) * 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  /** Called from generated code. NULL for an empty hash set: a
    * signature over zero elements would be [Long.MaxValue × k] for
    * EVERY such row — all shingle-less docs would collide in every
    * LSH band as phantom near-dups of estimated Jaccard 1.0
    * (review-caught; the documented-equivalent Column fold's
    * array_min returns NULL on empty arrays too).
    */
  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val s = seed(i)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = fmix64(hs.getLong(j) ^ s)
        if (v < min) min = v
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def apply(hs: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(hs), k))
}
