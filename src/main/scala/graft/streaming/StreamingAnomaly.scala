package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming z-score anomaly detection — the live twin of the batch
  * `q53_outliers` query: per group (event_type), maintain running
  * mean/variance as keyed state via Welford's algorithm and flag
  * arrivals more than `k` standard deviations from the mean the
  * stream had seen SO FAR.
  *
  * Why Welford: the naive (Σv, Σv²) pair cancels catastrophically
  * once mean² ≫ variance; Welford's (n, mean, M2) update is the
  * numerically-stable single-pass form, and its state is three
  * doubles per group — fixed bytes regardless of stream length.
  *
  * Within a micro-batch rows fold in (ts, id) order, so a replayed
  * batch produces identical flags (the iterator order Spark hands
  * the state function is not otherwise guaranteed). Flags are
  * emitted against the state BEFORE the arrival folds in — an
  * anomaly must not dilute the baseline it is judged against; it
  * still joins the baseline afterwards (streams drift, and a level
  * shift must eventually become the new normal).
  */
object StreamingAnomaly {

  case class Anomaly(group: String, id: Long, value: Double, z: Double)

  /** Welford state. Public for the state encoder's serializer. */
  case class WelfordState(n: Long, mean: Double, m2: Double)

  /** @param df       streaming DataFrame
    * @param groupCol grouping column (cast to string; NULL groups dropped)
    * @param idCol    row id for deterministic intra-batch order
    * @param tsCol    event-time column (long), primary fold order
    * @param valueCol measured value (NULLs dropped)
    * @param k        flag threshold in standard deviations
    * @param minN     observations required before flagging starts
    *                 (a 2-row baseline flags everything)
    */
  def detect(df: DataFrame, groupCol: Column, idCol: Column, tsCol: Column,
             valueCol: Column, k: Double = 3.0, minN: Long = 30L): Dataset[Anomaly] = {
    import df.sparkSession.implicits._
    require(k > 0 && minN >= 2, s"need k > 0 and minN >= 2, got k=$k minN=$minN")
    df.select(groupCol.cast("string").as("group"), idCol.cast("long").as("id"),
        tsCol.cast("long").as("t"), valueCol.cast("double").as("v"))
      .filter(col("group").isNotNull && col("v").isNotNull)
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[WelfordState, Anomaly](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (group, rows, state) =>
        var st = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
        val out = Seq.newBuilder[Anomaly]
        rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, id, _, v) =>
          if (st.n >= minN) {
            val sd = math.sqrt(st.m2 / st.n)
            if (sd > 0 && math.abs(v - st.mean) > k * sd)
              out += Anomaly(group, id, v, (v - st.mean) / sd)
          }
          // Welford fold
          val n1 = st.n + 1
          val d = v - st.mean
          val mean1 = st.mean + d / n1
          st = WelfordState(n1, mean1, st.m2 + d * (v - mean1))
        }
        state.update(st)
        out.result().iterator
      }
  }
}
