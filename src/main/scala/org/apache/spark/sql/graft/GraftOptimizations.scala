/* Hosted under org.apache.spark.sql for private[sql] access
 * (see JsonIsValid).
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: collapse directly-nested applications of
  * graft's IDEMPOTENT normalization expressions —
  *
  *   normalize_text(normalize_text(x))  =>  normalize_text(x)
  *   canonical_url(canonical_url(x))    =>  canonical_url(x)
  *
  * Why this arises in practice: composed pipelines normalize
  * DEFENSIVELY at stage boundaries (an ingest stage normalizes before
  * fingerprinting; a downstream curation stage, which cannot assume
  * its input came from that ingest, normalizes again). When such
  * stages end up fused into one plan, the optimizer — not the stage
  * authors — is the right place to erase the duplicate scan work:
  * each collapsed call saves a full pass over the string per row.
  *
  * Both collapses are sound because each function's OUTPUT is a fixed
  * point of the function (proven by property specs in
  * `GraftOptimizationsSpec`, not assumed):
  *  - normalize_text: NFC is idempotent, the post-NFC string has no
  *    stripped controls left, whitespace runs are already single
  *    spaces, and the result is trimmed — reapplying changes nothing.
  *  - canonical_url: scheme/host are already lowercased, default
  *    port/fragment/tracking params are gone, remaining query params
  *    are sorted, the trailing slash is trimmed — reapplying changes
  *    nothing (including on inputs the first pass REJECTED: it yields
  *    NULL, and the outer call of NULL is NULL either way).
  *
  * The match is deliberately conservative: only DIRECT nesting is
  * rewritten (after Catalyst's own alias inlining, the common
  * stage-composition shape is direct nesting), never separated
  * applications whose intermediate value is otherwise observed.
  */
object CollapseIdempotentCalls extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeText(inner @ NormalizeText(_)) => inner
      case CanonicalUrl(inner @ CanonicalUrl(_)) => inner
    }
}

object GraftOptimizations {

  /** Idempotent runtime injection into a live session (the
    * [[GraftSqlFunctions.register]] analog for optimizer rules —
    * `spark.experimental` is the sanctioned hook for sessions we did
    * not build; [[GraftExtensions]] covers the config-time path).
    */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(CollapseIdempotentCalls)) {
      spark.experimental.extraOptimizations = cur :+ CollapseIdempotentCalls
    }
  }
}
