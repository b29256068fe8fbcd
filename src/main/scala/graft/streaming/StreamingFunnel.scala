package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FunnelState
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming funnel tracking: the [[org.apache.spark.sql.graft.WindowFunnel]]
  * chain search run incrementally over keyed streaming state — per
  * user, the current funnel depth over the whole stream prefix,
  * re-emitted each trigger the user appears in (update mode). The
  * live twin of the batch `q48_funnel` report, the same pairing
  * [[StreamingHeavyHitters]] gives the MG sketch.
  *
  * State = the user's funnel-step events (the batch aggregate's
  * buffer, byte-identical via [[FunnelState]]), bounded by per-user
  * activity — the sessionization-style justified bound. One
  * deliberate tightening on top: once a user COMPLETES the funnel
  * (depth == nSteps), the event buffer is dropped and replaced by a
  * one-byte completed marker — a completed funnel can never regress,
  * so the state for converted users stops growing entirely (the
  * analog of ClickHouse's windowFunnel event cap, but lossless:
  * nothing is discarded until nothing more can change).
  *
  * Because the buffer accumulates exactly the events the batch
  * aggregate would see and the chain search is order-insensitive,
  * the emitted depth after any prefix equals the batch
  * `window_funnel` over that prefix — delivery chunking cannot
  * change it (proven in StreamingFunnelSpec).
  */
object StreamingFunnel {

  /** One user's current funnel status: depth over the stream prefix
    * and how many funnel events the state holds (0 once completed —
    * the buffer is dropped).
    */
  case class UserFunnel(user_id: Long, depth: Int, buffered_events: Int)

  /** Keyed state: completed flag + the (possibly empty) event
    * buffer image.
    */
  case class FunnelStateRow(completed: Boolean, events: Array[Byte])

  /** @param df      streaming DataFrame
    * @param userCol user/key column (cast to long; NULLs dropped)
    * @param tsCol   event-time column (bigint; NULLs dropped)
    * @param stepCol funnel step 1..nSteps (int; others ignored)
    */
  def depths(df: DataFrame, userCol: Column, tsCol: Column, stepCol: Column,
             nSteps: Int, window: Long): Dataset[UserFunnel] = {
    import df.sparkSession.implicits._
    require(nSteps >= 1, s"nSteps must be >= 1, got $nSteps")
    require(window > 0, s"window must be > 0, got $window")
    df.select(userCol.cast("long").as("u"), tsCol.cast("long").as("t"),
        stepCol.cast("int").as("s"))
      .filter(col("u").isNotNull && col("t").isNotNull &&
        col("s").isNotNull && col("s") >= 1 && col("s") <= nSteps)
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelStateRow, UserFunnel](
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        val prior = state.getOption
        if (prior.exists(_.completed)) {
          // converted users: nothing can change, nothing is stored
          rows.foreach(_ => ())
          UserFunnel(user, nSteps, 0)
        } else {
          val st = prior.map(p => FunnelState.fromBytes(p.events))
            .getOrElse(new FunnelState)
          rows.foreach(r => st.add(r._2, r._3))
          val depth = FunnelState.search(st, nSteps, window)
          if (depth == nSteps) {
            state.update(FunnelStateRow(completed = true, Array.empty))
            UserFunnel(user, depth, 0)
          } else {
            state.update(FunnelStateRow(completed = false, FunnelState.toBytes(st)))
            UserFunnel(user, depth, st.ts.length)
          }
        }
      }
  }
}
