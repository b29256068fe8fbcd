package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MgState
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming heavy hitters: a Misra-Gries summary
  * ([[org.apache.spark.sql.graft.MisraGriesTopK]]'s [[MgState]])
  * maintained per group as KEYED STREAMING STATE across micro-batches
  * — the "trending keys per event type" operator of an ingest
  * pipeline's ops surface.
  *
  * Why this is exactly right for a stream: MG is a mergeable summary,
  * so folding each micro-batch's arrivals into the per-group state
  * preserves the deterministic guarantee over the WHOLE STREAM PREFIX
  * (`est <= true <= est + n/(m+1)`, every key above n/(m+1) present)
  * — not just the current trigger. State per group is a fixed
  * m-entry buffer: bytes are bounded regardless of how many distinct
  * keys the stream has carried, which is the only state shape that
  * survives an unbounded key universe (a `groupBy(key).count`
  * streaming aggregate grows state linearly with distinct keys).
  *
  * Emitted per group per trigger (update output mode):
  * `(group, total_n, hitters)` with the current estimates,
  * est-descending — so the sink always holds the freshest summary
  * and the MG error bound is recomputable from `total_n`.
  */
object StreamingHeavyHitters {

  /** One group's current summary: stream-prefix row count plus the
    * tracked (key, est) pairs, estimate-descending.
    */
  case class GroupHitters(group: String, total_n: Long,
                          hitters: Seq[HitterEntry])
  case class HitterEntry(key: Long, est: Long)

  /** Serialized keyed state: the MG byte image plus the group's
    * exact arrival count (n is exact — it costs one long, and it is
    * what turns the state into a self-describing error bound).
    * Public: the state encoder's generated serializer needs
    * reflective access to the constructor and accessors.
    */
  case class HitterState(n: Long, sketch: Array[Byte])

  /** @param df       streaming DataFrame
    * @param groupCol grouping column (cast to string)
    * @param keyCol   tracked key column (cast to long; NULLs dropped)
    * @param m        MG capacity (state = m entries per group)
    */
  def trending(df: DataFrame, groupCol: Column, keyCol: Column,
               m: Int = 64): Dataset[GroupHitters] = {
    import df.sparkSession.implicits._
    require(m > 0, s"capacity m must be > 0, got $m")
    df.select(groupCol.cast("string").as("group"),
        keyCol.cast("long").as("key"))
      .filter(col("group").isNotNull && col("key").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[HitterState, GroupHitters](
        GroupStateTimeout.NoTimeout) { (group, rows, state) =>
        val st = state.getOption
          .map(s => MgState.fromBytes(s.sketch, m))
          .getOrElse(new MgState(m))
        var n = state.getOption.map(_.n).getOrElse(0L)
        rows.foreach { r => st.addOne(r._2); n += 1 }
        state.update(HitterState(n, MgState.toBytes(st)))
        GroupHitters(group, n,
          st.sortedEntries.toSeq.map { case (k, c) => HitterEntry(k, c) })
      }
  }
}
