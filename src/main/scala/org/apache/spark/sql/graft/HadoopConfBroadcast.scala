package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Minimal public door to Spark's `SerializableConfiguration`
  * (private[spark]): tasks that do raw Hadoop I/O — e.g. the parquet
  * footer reads behind snapshot manifest stats — need the DRIVER's
  * Hadoop configuration (credentials, fs.* bindings) on the
  * executors; building `new Configuration()` in a task would read
  * whatever defaults the executor JVM happens to see, which on a real
  * cluster silently drops per-job object-store credentials. */
object HadoopConfBroadcast {
  def create(sc: SparkContext): Broadcast[SerializableConfiguration] =
    sc.broadcast(new SerializableConfiguration(sc.hadoopConfiguration))

  def value(b: Broadcast[SerializableConfiguration]): Configuration = b.value.value
}
