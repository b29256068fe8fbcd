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
}
