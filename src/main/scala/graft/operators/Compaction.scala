package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the [[EventsSink]] layout — the
  * maintenance job every long-lived partitioned table needs: a
  * streaming ingest (one file per micro-batch per day) or a
  * many-task backfill leaves day partitions holding hundreds of
  * KB-sized parquet files, and at 100 TB the file-listing and
  * per-file open costs start to dominate scans (the problem
  * ClickHouse's background merges solve for MergeTree parts; Delta
  * and Iceberg ship OPTIMIZE/rewrite_data_files for the same
  * reason).
  *
  * `compact` rewrites each day partition into ~`targetRecordsPerFile`
  * files while PRESERVING the layout contract: day partitioning and
  * the (user_id, ts) within-file sort that gives row-group min/max
  * skipping (re-asserted by EventsSinkSpec's checker post-compaction,
  * and re-verified here by row count before the swap). The rewrite
  * goes to a temp directory first; the swap happens only after the
  * rewritten row count matches the source, and the original is
  * PARKED aside (rename) rather than deleted, so every failure
  * window leaves a recoverable copy on disk — a pre-swap failure
  * leaves the original in place, a mid-swap crash leaves it parked
  * at `__compact_old`. Each individual rename is atomic on
  * HDFS-like stores; object stores want a manifest-commit layer
  * (Delta/Iceberg, or [[Snapshots]] here) instead of rename — out
  * of scope here, the operator's shape is the same.
  */
object Compaction {

  /** (files, bytes) under `path`, parquet data files only. */
  case class DirStats(files: Int, bytes: Long)

  case class CompactionStats(
      beforeFiles: Int, afterFiles: Int, rows: Long, bytes: Long)

  /** The path's OWN filesystem — `FileSystem.get(conf)` would return
    * the default FS and silently operate on the wrong store when the
    * table path carries a different scheme (e.g. a `file:/` table on
    * an `hdfs://`-default cluster; review-caught).
    */
  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parquetFiles(spark: SparkSession, path: String): Seq[FileStatus] = {
    val f = fsFor(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else {
      val it = f.listFiles(p, true)
      val out = scala.collection.mutable.ArrayBuffer[FileStatus]()
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) out += st
      }
      out.toSeq
    }
  }

  def audit(spark: SparkSession, path: String): DirStats = {
    val files = parquetFiles(spark, path)
    DirStats(files.size, files.map(_.getLen).sum)
  }

  /** Rewrite an [[EventsSink]] table in place into
    * ~`targetRecordsPerFile`-row files per day partition.
    */
  def compact(spark: SparkSession, path: String,
              targetRecordsPerFile: Long = 4000000L): CompactionStats = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be > 0")
    val before = audit(spark, path)
    val src = spark.read.parquet(path)
    val srcRows = src.count()
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    val f = fsFor(spark, path)
    f.delete(new Path(tmp), true)
    src
      .repartition(col(EventsSink.dayCol))
      // partition column leads the sort so FileFormatWriter keeps the
      // (user_id, ts) order in the files (see EventsSink.write)
      .sortWithinPartitions(col(EventsSink.dayCol), col("user_id"), col("ts"))
      .write
      .partitionBy(EventsSink.dayCol)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .mode("overwrite")
      .parquet(tmp)
    val rewrittenRows = spark.read.parquet(tmp).count()
    require(rewrittenRows == srcRows,
      s"compaction row mismatch: source $srcRows, rewritten $rewrittenRows — " +
        s"original left untouched at $path")
    // swap via PARK-then-rename, never delete-then-rename: deleting
    // the original first opened a window where a crash (or a failed
    // cross-filesystem rename) lost the table with only the tmp copy
    // left (review-caught). Parking the original aside keeps it
    // recoverable through every window: a crash between the two
    // renames leaves `path` absent but BOTH copies on disk; a failed
    // tmp rename restores the original immediately.
    val dst = new Path(path)
    val old = new Path(path.stripSuffix("/") + "__compact_old")
    f.delete(old, true) // leftover park from an earlier crash
    require(f.rename(dst, old), s"park $path -> $old failed — original untouched")
    if (!f.rename(new Path(tmp), dst)) {
      require(f.rename(old, dst), s"rename AND restore failed — data parked at $old")
      throw new IllegalStateException(
        s"rename $tmp -> $path failed; original restored")
    }
    f.delete(old, true) // committed: drop the parked original
    val after = audit(spark, path)
    CompactionStats(before.files, after.files, srcRows, after.bytes)
  }
}
