/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Misra-Gries frequent-items summary over BIGINT keys, capacity m.
  *
  * Invariant (the mergeable-summaries guarantee, Agarwal et al.,
  * PODS 2012): after any sequence of updates and merges over a
  * stream of n items, every tracked key carries an estimate with
  *
  *   est(k) <= true(k)  and  true(k) - est(k) <= n / (m + 1)
  *
  * so every key with true frequency above n/(m+1) is GUARANTEED
  * present. This is the deterministic counterpart to the HLL
  * (`q35_approx_distinct`) and Greenwald-Khanna
  * (`q45_approx_quantiles`) sketches: at 100 TB it replaces a
  * full `groupBy(key).count` shuffle of every distinct key with one
  * m-entry buffer per partition, merged map-side.
  *
  * Update is the classic algorithm: increment a tracked key, insert
  * when below capacity, otherwise decrement ALL m counters by one and
  * discard the arrival (each such round retires m+1 units of stream
  * weight, which is where the n/(m+1) deficit bound comes from).
  * Merge is the summary-mergeability construction: sum matching
  * counters, then subtract the (m+1)-th largest count from every
  * entry and drop the non-positive ones — the subtraction retires at
  * least (m+1) x that count of weight, so the per-key deficit stays
  * within the combined bound.
  */
final class MgState(val m: Int) {
  val counts = new java.util.HashMap[Long, Long](m * 2)

  def addOne(key: Long): Unit = {
    val cur = counts.get(key)
    if (cur != 0L || counts.containsKey(key)) {
      counts.put(key, cur + 1L)
    } else if (counts.size < m) {
      counts.put(key, 1L)
    } else {
      // decrement-all round: the arrival itself is also discarded
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove()
        else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Union-sum with `other`, then compress back to m entries by
    * subtracting the (m+1)-th largest count (no-op when the union
    * already fits).
    */
  def mergeWith(other: MgState): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > m) {
      val values = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      // (m+1)-th largest of `size` values, ascending-sorted
      val cut = values(values.length - (m + 1))
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove()
        else e.setValue(e.getValue - cut)
      }
    }
  }

  /** (key, est) pairs, est descending then key ascending — a total
    * order so the aggregate's output is deterministic.
    */
  def sortedEntries: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue)
      i += 1
    }
    out.sortWith { case ((ka, ca), (kb, cb)) => ca > cb || (ca == cb && ka < kb) }
  }
}

object MgState {

  /** Flat (size, key, est, key, est, ...) byte image — shared by the
    * aggregate buffer and the streaming keyed state
    * ([[graft.streaming.StreamingHeavyHitters]]).
    */
  def toBytes(st: MgState): Array[Byte] = {
    val n = st.counts.size
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    val it = st.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], m: Int): MgState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val st = new MgState(m)
    var i = 0
    while (i < n) {
      st.counts.put(bb.getLong(), bb.getLong())
      i += 1
    }
    st
  }
}

/** `mg_topk(key, m)` — Misra-Gries frequent-items aggregate returning
  * `array<struct<key bigint, est bigint>>`, estimate-descending.
  * See [[MgState]] for the deterministic error guarantee.
  */
case class MisraGriesTopK(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgState] with UnaryLike[Expression] {

  require(m > 0, "mg_topk needs capacity m > 0")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mg_topk needs a bigint key, got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgState = new MgState(m)

  override def update(buffer: MgState, input: InternalRow): MgState = {
    val k = child.eval(input)
    if (k != null) buffer.addOne(k.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MgState, other: MgState): MgState = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: MgState): Any =
    new GenericArrayData(buffer.sortedEntries.map { case (k, c) =>
      InternalRow(k, c)
    })

  override def serialize(buffer: MgState): Array[Byte] =
    MgState.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): MgState =
    MgState.fromBytes(bytes, m)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)

  override def prettyName: String = "mg_topk"
}

object MisraGriesTopK {

  /** Column wrapper (aggregate usage: `df.agg(...)`). */
  def apply(key: Column, m: Int): Column =
    ExpressionUtils.column(
      MisraGriesTopK(ExpressionUtils.expression(key), m).toAggregateExpression())
}
