package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations for the streaming surface:
  * tumbling / sliding / session windows over a watermarked timestamp
  * column. Batch equivalents are registered as oracle-checked
  * queries (q13/q14 in [[graft.queries.Queries]]); these streaming
  * forms add the watermark, which bounds state: Spark drops window
  * state (and late events) once the watermark passes the window end,
  * so state size is O(active windows), not O(history) — the property
  * that keeps a 100 TB/day stream bounded.
  */
object WindowedAggs {

  private def agg(grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    grouped.agg(
      count(lit(1)).as("cnt"),
      sum(col("value")).as("total_value"))

  /** Tumbling windows: each event lands in exactly one window. */
  def tumbling(events: DataFrame, tsCol: String = "ts",
               size: String = "6 hours", watermark: String = "1 hour"): DataFrame =
    agg(events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size), col("event_type")))

  /** Sliding windows: each event lands in size/slide windows. */
  def sliding(events: DataFrame, tsCol: String = "ts",
              size: String = "6 hours", slide: String = "3 hours",
              watermark: String = "1 hour"): DataFrame =
    agg(events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size, slide), col("event_type")))

  /** Session windows: gap-based merging per key. */
  def sessions(events: DataFrame, tsCol: String = "ts",
               gap: String = "30 minutes", watermark: String = "1 hour",
               keyCol: String = "user_id"): DataFrame =
    agg(events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap)))
}
