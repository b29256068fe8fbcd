package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** The reference's ops surface (Spring actuator health / info /
  * prometheus — `consumer/src/main/resources/application.yml:55-59`)
  * re-expressed over Structured Streaming's own instrumentation.
  * The analog mapping:
  *
  *  - `/actuator/health`   → [[health]]: one row per active query
  *    with liveness (isActive / trigger-active / data-available) and
  *    the last-seen exception;
  *  - `/actuator/metrics`  → [[progress]]: the last
  *    `StreamingQueryProgress` per query flattened to the counters a
  *    scraper wants (batch id, input/processed rows per second, row
  *    counts, batch durations, state-store rows/memory);
  *  - `/actuator/prometheus` (time series) → [[MetricsListener]]: a
  *    `StreamingQueryListener` that keeps the last N batch metrics
  *    per query in a bounded ring — the scrape buffer. Bounded by
  *    construction: an unbounded listener buffer on a long-running
  *    driver is a leak, not a metric.
  *
  * Everything reads DRIVER-LOCAL state published by Spark's listener
  * bus — no job is launched, so an ops poll can never contend with
  * the stream it is observing (the property actuator endpoints have).
  */
object OpsReport {

  /** Health row per active streaming query (the /health analog). */
  def health(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active.toSeq.map { q =>
      (q.id.toString, Option(q.name).getOrElse(""), q.isActive,
        q.status.isTriggerActive, q.status.isDataAvailable,
        q.status.message,
        q.exception.map(_.getMessage).getOrElse(""))
    }.toDF("query_id", "name", "is_active", "trigger_active",
      "data_available", "status_message", "last_error")
  }

  /** Last-progress counters per active query (the /metrics analog).
    * Queries that have not completed a batch yet surface with
    * batch_id −1 and zero counters rather than being dropped — a
    * stuck-before-first-batch stream is exactly what an operator
    * needs to see.
    */
  def progress(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active.toSeq.map { q =>
      Option(q.lastProgress) match {
        case Some(p) =>
          val state = p.stateOperators
          (q.id.toString, Option(q.name).getOrElse(""), p.batchId,
            p.numInputRows,
            zeroIfNaN(p.inputRowsPerSecond),
            zeroIfNaN(p.processedRowsPerSecond),
            Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
            state.map(_.numRowsTotal).sum,
            state.map(_.memoryUsedBytes).sum)
        case None =>
          (q.id.toString, Option(q.name).getOrElse(""), -1L, 0L, 0.0, 0.0, 0L, 0L, 0L)
      }
    }.toDF("query_id", "name", "batch_id", "input_rows",
      "input_rows_per_sec", "processed_rows_per_sec",
      "trigger_duration_ms", "state_rows", "state_memory_bytes")
  }

  private def zeroIfNaN(d: Double): Double = if (d.isNaN) 0.0 else d

  /** One retained batch sample. */
  final case class BatchMetric(queryId: String, batchId: Long,
      numInputRows: Long, processedRowsPerSecond: Double,
      triggerDurationMs: Long, timestamp: String)

  /** Bounded per-query ring of recent batch metrics — the scrape
    * buffer behind the /prometheus analog. Register with
    * `spark.streams.addListener`; read with [[snapshot]]/[[report]].
    * Thread-safe: listener callbacks arrive on the listener-bus
    * thread while readers poll from elsewhere.
    */
  final class MetricsListener(keepPerQuery: Int = 100)
      extends StreamingQueryListener {
    require(keepPerQuery > 0, s"ring size must be positive, got $keepPerQuery")

    private val rings =
      new java.util.concurrent.ConcurrentHashMap[String,
        java.util.ArrayDeque[BatchMetric]]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      record(BatchMetric(p.id.toString, p.batchId, p.numInputRows,
        if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        p.timestamp))
    }

    /** Ring insert with eviction — the whole bounding contract;
      * package-visible so the bound is testable without forging
      * Spark listener events (their constructors are private). */
    private[streaming] def record(m: BatchMetric): Unit = {
      val ring = rings.computeIfAbsent(m.queryId,
        _ => new java.util.ArrayDeque[BatchMetric]())
      ring.synchronized {
        ring.addLast(m)
        while (ring.size > keepPerQuery) ring.removeFirst()
      }
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    // termination keeps the ring: post-mortem metrics are the ones an
    // operator reads after a crash; the map is bounded by the number
    // of distinct queries this driver ran

    /** Immutable copy of every retained sample. */
    def snapshot(): Seq[BatchMetric] = {
      val out = Seq.newBuilder[BatchMetric]
      rings.forEach { (_, ring) =>
        ring.synchronized { ring.forEach(m => out += m) }
      }
      out.result()
    }

    /** The retained time series as a DataFrame (scrape shape). */
    def report(spark: SparkSession): DataFrame = {
      import spark.implicits._
      snapshot().toDF()
    }
  }

  /** Block until `q` has completed at least one batch with data —
    * the readiness probe (/health's "UP" condition for a consumer).
    */
  def awaitFirstData(q: StreamingQuery, timeoutMs: Long): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline) {
      if (Option(q.lastProgress).exists(_.numInputRows > 0)) return true
      Thread.sleep(20L)
    }
    Option(q.lastProgress).exists(_.numInputRows > 0)
  }
}
