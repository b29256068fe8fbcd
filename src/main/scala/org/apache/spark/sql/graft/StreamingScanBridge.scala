package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.types.StructType

/** Micro-batch DataFrames for V1 streaming `Source.getBatch`
  * implementations — the FileStreamSource/Delta pattern: each batch is
  * a REAL parquet scan over exactly the batch's files (full predicate
  * pushdown, column pruning, and distributed execution apply — no rows
  * ever pass through the driver), wrapped in a `LogicalRelation` with
  * `isStreaming = true` because `MicroBatchExecution` asserts the
  * DataFrame a source returns is streaming-flagged.
  *
  * Lives under `org.apache.spark.sql` because `Dataset.ofRows`,
  * `DataSource` and `LogicalRelation` are `private[sql]` — the same
  * bridge rationale as [[ColumnBridge]].
  */
object StreamingScanBridge {

  /** A streaming-flagged DataFrame scanning `paths` as parquet with
    * the given (physical) schema. Empty `paths` yield an empty
    * streaming relation of the same schema. */
  def streamingParquetDf(spark: SparkSession, schema: StructType,
                         paths: Seq[String]): DataFrame = {
    if (paths.isEmpty) return emptyStreamingDf(spark, schema)
    val cls = spark.asInstanceOf[ClassicSession]
    val relation = DataSource(
      sparkSession = cls,
      className = "parquet",
      paths = paths,
      userSpecifiedSchema = Some(schema)).resolveRelation(checkFilesExist = false)
    ClassicDataset.ofRows(cls, LogicalRelation(relation, isStreaming = true))
  }

  /** An empty streaming-flagged relation (a batch with no new files —
    * e.g. a metadata-only rename version). */
  def emptyStreamingDf(spark: SparkSession, schema: StructType): DataFrame = {
    val cls = spark.asInstanceOf[ClassicSession]
    ClassicDataset.ofRows(cls,
      LocalRelation(DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
  }

  /** Re-wrap the micro-batch DataFrame a V1 `Sink.addBatch` receives
    * as a NON-streaming DataFrame over the SAME physical rows (the
    * DeltaSink trick): the engine hands the sink a Dataset over its
    * IncrementalExecution whose leaves are streaming-flagged, so any
    * re-planning write (`df.write`, a snapshot commit) would refuse
    * with "streaming sources must be executed with writeStream". The
    * internalCreateDataFrame bridge executes the batch's plan ONCE
    * and exposes its rows as an ordinary batch frame. */
  def unstream(data: DataFrame): DataFrame = {
    val cls = data.sparkSession.asInstanceOf[ClassicSession]
    cls.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
