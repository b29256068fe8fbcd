package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the last major Structured
  * Streaming surface: correlating two live streams with bounded
  * state.
  *
  * The canonical shape is click→purchase attribution: match each
  * purchase to the same user's clicks in the preceding window. Both
  * sides carry watermarks and the join condition bounds event-time
  * distance, so Spark can expire state once the watermark passes a
  * row's latest possible match — state stays O(window), not O(stream).
  * At 100 TB/day this is what makes the join runnable at all: without
  * the time bound the state store would hold both full streams.
  */
object StreamJoins {

  /** Inner interval join: (click, purchase) pairs with
    * `purchase.ts ∈ [click.ts, click.ts + window]` and the same user.
    *
    * @param clicks    streaming DataFrame: user_id, ts, click cols
    * @param purchases streaming DataFrame: user_id, ts, purchase cols
    * @param window    attribution window, e.g. "1 hour"
    * @param watermark max lateness tolerated on BOTH streams
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
                  window: String = "1 hour",
                  watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark).alias("c")
    val p = purchases.withWatermark("ts", watermark).alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
         |p.ts >= c.ts AND
         |p.ts <= c.ts + INTERVAL $window""".stripMargin))
  }
}
