package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming cohort/retention tracking — the live twin of the batch
  * `q49_retention` / `q50_cohort_matrix` reports, completing the
  * batch↔streaming pairing the funnel ([[StreamingFunnel]]), anomaly
  * ([[StreamingAnomaly]]) and heavy-hitter
  * ([[StreamingHeavyHitters]]) operators already have.
  *
  * Per user, keyed state holds exactly two things:
  *  - `cohortWeek`: the MINIMUM signup week seen so far (signups can
  *    arrive out of event-time order — a late-arriving earlier
  *    signup LOWERS the cohort, which is why pre-cohort activity
  *    weeks must be retained, not discarded on arrival);
  *  - the set of distinct activity weeks seen so far.
  *
  * Each trigger a user appears in re-emits the user's full
  * (cohort_week, weeks) snapshot (update mode). The cohort TRIANGLE
  * is then a pure aggregation over the latest snapshot per user —
  * `offsets = weeks.filter(_ >= cohort) - cohort` — identical to the
  * batch matrix's `active JOIN cohorts WHERE w >= cohort_week`
  * derivation, so after ANY delivered prefix the reconciled matrix
  * equals the batch `q50_cohort_matrix` over that prefix (proven
  * under chunked delivery in StreamingRetentionSpec).
  *
  * State is fixed-size in the operating sense: the week set is
  * bounded by the CALENDAR — one entry per distinct week of product
  * lifetime (a decade is ~520 longs), independent of event volume;
  * the per-user buffering justification is stronger than
  * sessionization's (which is bounded only by per-user activity).
  */
object StreamingRetention {

  /** One user's current snapshot: cohort week (-1 until a signup is
    * seen) and every distinct activity week so far, ascending. */
  case class UserCohort(user_id: Long, cohort_week: Long, weeks: Array[Long])

  /** Keyed state: Long.MaxValue cohort sentinel = no signup yet. */
  case class CohortStateRow(cohortWeek: Long, weeks: Array[Long])

  /** @param df        streaming DataFrame
    * @param userCol   user/key column (cast to long; NULLs dropped —
    *                  anonymous traffic has no cohort)
    * @param weekCol   event-time week bucket (bigint; NULLs dropped)
    * @param signupCol whether this event is the cohort-anchoring
    *                  signup (boolean)
    */
  def cohorts(df: DataFrame, userCol: Column, weekCol: Column,
              signupCol: Column): Dataset[UserCohort] = {
    import df.sparkSession.implicits._
    df.select(userCol.cast("long").as("u"), weekCol.cast("long").as("w"),
        signupCol.cast("boolean").as("sg"))
      .filter(col("u").isNotNull && col("w").isNotNull && col("sg").isNotNull)
      .as[(Long, Long, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[CohortStateRow, UserCohort](
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        val prior = state.getOption.getOrElse(
          CohortStateRow(Long.MaxValue, Array.empty))
        var cohort = prior.cohortWeek
        val weeks = scala.collection.mutable.SortedSet.empty[Long]
        weeks ++= prior.weeks
        rows.foreach { r =>
          weeks += r._2
          if (r._3 && r._2 < cohort) cohort = r._2
        }
        val arr = weeks.toArray
        state.update(CohortStateRow(cohort, arr))
        UserCohort(user, if (cohort == Long.MaxValue) -1L else cohort, arr)
      }
  }

  /** The cohort triangle from the LATEST snapshot per user (e.g. the
    * reconciled content of an update-mode sink): one row per
    * (cohort_week, week_offset) with its distinct-user count —
    * byte-compatible with the batch `q50_cohort_matrix` output. */
  def matrix(latest: Dataset[UserCohort]): DataFrame =
    latest.toDF()
      .filter(col("cohort_week") >= 0)
      .select(col("user_id"), col("cohort_week"), explode(col("weeks")).as("w"))
      .filter(col("w") >= col("cohort_week"))
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
}
