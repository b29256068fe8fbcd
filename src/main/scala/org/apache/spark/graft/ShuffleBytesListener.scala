/* Hosted under org.apache.spark (core, not sql) for listener-bus
 * access: waitUntilEmpty() is private[spark], and without it a
 * per-query shuffle-byte meter races the async listener bus.
 */
package org.apache.spark.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query shuffle-write byte meter for the stress bench: sums
  * `shuffleWriteMetrics.bytesWritten` across all tasks between
  * `reset()` and `read()`. The read drains the listener bus first so
  * counts are exact, not racy.
  */
final class ShuffleBytesListener(sc: SparkContext) extends SparkListener {
  private val bytes = new AtomicLong(0L)
  sc.addSparkListener(this)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
  }

  def reset(): Unit = {
    sc.listenerBus.waitUntilEmpty()
    bytes.set(0L)
  }

  def read(): Long = {
    sc.listenerBus.waitUntilEmpty()
    bytes.get()
  }
}
