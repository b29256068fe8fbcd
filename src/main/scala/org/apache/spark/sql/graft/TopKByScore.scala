/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs seen so
  * far, where "better" = higher score, ties broken by lower id (the
  * same total order as `ORDER BY score DESC, id ASC`).
  *
  * Backed by a size-k binary min-heap whose head is the WORST kept
  * element, so every update is O(log k) and the buffer never holds
  * more than k entries — this is what makes the aggregate's partial
  * (map-side) phase a constant-size reduction of an arbitrarily
  * large scored partition.
  */
final class TopKState(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a-slot is worse than (score, id)? worse = lower score, or equal
    * score and higher id.
    */
  @inline private def worse(i: Int, score: Double, id: Long): Boolean = {
    val c = java.lang.Double.compare(scores(i), score)
    c < 0 || (c == 0 && ids(i) > id)
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(l, scores(m), ids(m))) m = l
      if (r < size && worse(r, scores(m), ids(m))) m = r
      if (m == i) done = true
      else {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(m); ids(i) = ids(m)
        scores(m) = s; ids(m) = d
        i = m
      }
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(i, scores(p), ids(p))) {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = s; ids(p) = d
        i = p
      } else i = 0
    }
  }

  def insert(score: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (worse(0, score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }

  /** (score, id) pairs best-first — the SAME total order as the
    * heap's `worse` (Double.compare, so NaN sorts as the largest
    * score, matching Spark's `ORDER BY score DESC` NaN placement);
    * a `>`-based comparator would be intransitive under NaN.
    */
  def sortedPairs: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((sa, ia), (sb, ib)) =>
      val c = java.lang.Double.compare(sa, sb)
      c > 0 || (c == 0 && ia < ib)
    }
  }
}

/** Top-k-by-score aggregate: `top_k_by_score(score, id, k)` returns
  * the k (id, score) pairs with the highest scores as an
  * `array<struct<id bigint, score double>>`, best-first, ties by
  * lower id — exactly `ORDER BY score DESC, id ASC LIMIT k`.
  *
  * Why an aggregate instead of a ranking window: a window
  * `partitionBy(query)` must shuffle EVERY scored row into |queries|
  * partitions before ranking — a scale-killer when the scored set is
  * the whole corpus. As an aggregate the partial (map-side) phase
  * reduces each input partition to one k-sized heap per group, so
  * only |groups| × |partitions| buffers of k pairs ever shuffle —
  * the distributed-top-k shape of `TakeOrderedAndProject`,
  * generalized to per-group k.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] with BinaryLike[Expression] {

  require(k > 0, "top_k_by_score needs k > 0")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_by_score needs (double, bigint), got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKState): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (s, i) =>
      InternalRow(i, s)
    })

  override def serialize(buffer: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val st = new TopKState(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val d = bb.getLong()
      st.insert(s, d)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {

  /** Column wrapper (aggregate usage: `df.groupBy(...).agg(...)`). */
  def apply(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(
        ExpressionUtils.expression(score),
        ExpressionUtils.expression(id), k).toAggregateExpression())
}
