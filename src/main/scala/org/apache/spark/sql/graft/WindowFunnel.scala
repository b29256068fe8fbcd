/* Hosted under org.apache.spark.sql for private[sql] access and
 * Column wrapping (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Per-group event buffer for [[WindowFunnel]]: the (ts, step) pairs
  * of funnel-relevant events. Sorting and chain search happen once at
  * eval — the buffer itself is order-insensitive, so partial
  * aggregation and merges are trivially correct under Spark's
  * nondeterministic row order (the same design as ClickHouse's
  * windowFunnel state, which also buffers and sorts at finalization).
  * State is bounded by the GROUP's funnel-event count (per-user
  * activity), never by corpus size.
  */
final class FunnelState {
  val ts = new ArrayBuffer[Long]()
  val step = new ArrayBuffer[Int]()

  def add(t: Long, s: Int): Unit = { ts += t; step += s }
}

object FunnelState {

  /** Flat (size, ts, step, ...) byte image — shared by the aggregate
    * buffer and the streaming keyed state
    * ([[graft.streaming.StreamingFunnel]]).
    */
  def toBytes(st: FunnelState): Array[Byte] = {
    val n = st.ts.length
    val bb = ByteBuffer.allocate(4 + n * 12)
    bb.putInt(n)
    var i = 0
    while (i < n) {
      bb.putLong(st.ts(i))
      bb.putInt(st.step(i))
      i += 1
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): FunnelState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val st = new FunnelState
    var i = 0
    while (i < n) {
      val t = bb.getLong()
      val s = bb.getInt()
      st.add(t, s)
      i += 1
    }
    st
  }

  /** Longest strictly-increasing step-1..k chain within `windowSpan`
    * of its step-1 start — every start tried, greedy extension within
    * a fixed start (optimal there). The chain-search core shared by
    * the batch aggregate's eval and the streaming state operator.
    */
  def search(buffer: FunnelState, nSteps: Int, windowSpan: Long): Int = {
    val byStep = Array.fill(nSteps)(new ArrayBuffer[Long]())
    var i = 0
    while (i < buffer.ts.length) {
      byStep(buffer.step(i) - 1) += buffer.ts(i)
      i += 1
    }
    val sorted = byStep.map { b =>
      val a = b.toArray
      java.util.Arrays.sort(a)
      a
    }
    def nextIn(a: Array[Long], lo: Long, hi: Long): Option[Long] = {
      var idx = java.util.Arrays.binarySearch(a, lo)
      if (idx >= 0) {
        while (idx < a.length && a(idx) == lo) idx += 1
      } else idx = -idx - 1
      if (idx < a.length && a(idx) <= hi) Some(a(idx)) else None
    }
    var best = 0
    val starts = sorted(0)
    var s = 0
    while (s < starts.length && best < nSteps) {
      val t1 = starts(s)
      val hi = t1 + windowSpan
      var depth = 1
      var prev = t1
      var k = 1
      var alive = true
      while (alive && k < nSteps) {
        nextIn(sorted(k), prev, hi) match {
          case Some(t) => depth += 1; prev = t; k += 1
          case None => alive = false
        }
      }
      if (depth > best) best = depth
      s += 1
    }
    best
  }
}

/** `window_funnel(ts, step, nSteps, window)` — longest funnel chain
  * depth within a sliding window, the ClickHouse `windowFunnel`
  * analog re-expressed as a Spark aggregate.
  *
  * Semantics (deliberately pinned, and mirrored exactly by the SQL
  * oracle): a chain is a sequence of events with steps 1..k whose
  * timestamps STRICTLY increase, all within `window` of the step-1
  * event's timestamp. The result is the maximum k over every
  * possible step-1 start (0 when the group has no step-1 event).
  * Greedy extension from a FIXED start is optimal (the earliest
  * feasible next-step event can only leave more room), but the best
  * START is not necessarily the earliest — so eval tries every
  * step-1 event, exactly like the oracle's per-start greedy SQL.
  * Per-group eval cost is O(starts x log(events)) after one sort;
  * group state is the user's funnel events — bounded by per-user
  * activity, the same justified-bounded shape as sessionization.
  */
case class WindowFunnel(
    tsExpr: Expression,
    stepExpr: Expression,
    nSteps: Int,
    windowSpan: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FunnelState] with BinaryLike[Expression] {

  require(nSteps >= 1, "window_funnel needs nSteps >= 1")
  require(windowSpan > 0, "window_funnel needs window > 0")

  override def left: Expression = tsExpr
  override def right: Expression = stepExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (tsExpr.dataType, stepExpr.dataType) match {
      case (LongType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_funnel needs (bigint ts, int step), got $other")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FunnelState = new FunnelState

  override def update(buffer: FunnelState, input: InternalRow): FunnelState = {
    val t = tsExpr.eval(input)
    val s = stepExpr.eval(input)
    if (t != null && s != null) {
      val si = s.asInstanceOf[Int]
      if (si >= 1 && si <= nSteps) buffer.add(t.asInstanceOf[Long], si)
    }
    buffer
  }

  override def merge(buffer: FunnelState, other: FunnelState): FunnelState = {
    var i = 0
    while (i < other.ts.length) {
      buffer.add(other.ts(i), other.step(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: FunnelState): Any =
    FunnelState.search(buffer, nSteps, windowSpan)

  override def serialize(buffer: FunnelState): Array[Byte] =
    FunnelState.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): FunnelState =
    FunnelState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowFunnel =
    copy(tsExpr = newLeft, stepExpr = newRight)

  override def prettyName: String = "window_funnel"
}

object WindowFunnel {

  /** Column wrapper (aggregate usage: `df.groupBy(...).agg(...)`). */
  def apply(ts: Column, step: Column, nSteps: Int, window: Long): Column =
    ExpressionUtils.column(
      WindowFunnel(
        ExpressionUtils.expression(ts),
        ExpressionUtils.expression(step),
        nSteps, window).toAggregateExpression())
}
