package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table — a minimal manifest-based
  * transaction log (the Delta/Iceberg mechanism in one file): each
  * commit writes new data files into the table directory, then
  * atomically publishes a manifest listing EXACTLY the files that
  * make up that version.
  *
  * Why this matters at scale: plain `overwrite` on object storage is
  * neither atomic nor isolated — readers see partial file sets
  * during a rewrite, and a failed job leaves the table corrupt. With
  * manifests:
  *  - readers resolve `_v<N>.manifest` and read ONLY its files —
  *    concurrent commits never affect a running read (snapshot
  *    isolation);
  *  - a commit is one atomic rename of the manifest — a crash before
  *    it leaves invisible orphan files, never a torn table;
  *  - old versions stay readable (time travel) until vacuumed;
  *  - optimistic concurrency: a commit expecting version N fails if
  *    N+1 already exists, instead of silently clobbering a racer.
  *
  * Files are listed relative to the table root so the table
  * relocates. Data files land under `data/` with a version prefix —
  * nothing is ever rewritten in place.
  */
object Snapshots {

  private def root(dir: String): Path = Paths.get(dir)
  private def manifest(dir: String, v: Long): Path =
    root(dir).resolve(f"_v$v%06d.manifest")

  /** Largest committed version, or -1 for an empty/new table.
    * Streams are closed (they hold directory handles — leaking them
    * exhausts fds on a long-lived driver); non-numeric `_v*.manifest`
    * names (manual backups etc.) are ignored, not fatal.
    */
  def currentVersion(dir: String): Long = {
    val r = root(dir)
    if (!Files.isDirectory(r)) -1L
    else {
      val s = Files.list(r)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("_v") && n.endsWith(".manifest") =>
          n.stripPrefix("_v").stripSuffix(".manifest") }
        .filter(v => v.nonEmpty && v.forall(_.isDigit))
        .map(_.toLong)
        .foldLeft(-1L)(math.max)
      finally s.close()
    }
  }

  /** Commit `df` as the next version. `expectedVersion` (if given)
    * enables optimistic concurrency: the commit refuses when the
    * table moved under it.
    */
  def commit(df: DataFrame, dir: String, expectedVersion: Option[Long] = None): Long = {
    val cur = currentVersion(dir)
    expectedVersion.foreach { e =>
      require(cur == e,
        s"concurrent commit: table at version $cur, expected $e — rebase and retry")
    }
    val v = cur + 1
    val dataDir = root(dir).resolve("data").resolve(f"v$v%06d")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val walk = Files.walk(dataDir)
    val files =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => root(dir).relativize(p).toString)
        .toSeq.sorted
      finally walk.close()
    require(files.nonEmpty || df.isEmpty, s"no data files written under $dataDir")
    // write-then-rename: the manifest appears atomically or not at all
    val tmp = root(dir).resolve(f"_v$v%06d.manifest.tmp")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    try
      Files.move(tmp, manifest(dir, v), StandardCopyOption.ATOMIC_MOVE)
    catch { case e: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new IllegalStateException(
        s"concurrent commit: version $v appeared during publish", e)
    }
    v
  }

  /** Read a specific version (default: latest). */
  def read(spark: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else currentVersion(dir)
    require(v >= 0, s"no committed version in $dir")
    val m = manifest(dir, v)
    require(Files.exists(m), s"version $v does not exist in $dir")
    val files = new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty)
      .map(rel => root(dir).resolve(rel).toString)
    if (files.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Drop manifests AND their unreferenced data files for versions
    * older than `keepFrom`. Files still referenced by a surviving
    * manifest are kept (versions may share files in future reuse
    * schemes; today each version owns its directory).
    */
  def vacuum(dir: String, keepFrom: Long): Unit = {
    val cur = currentVersion(dir)
    require(keepFrom <= cur, s"keepFrom $keepFrom beyond current $cur")
    val keep: Set[String] = (keepFrom to cur).flatMap { v =>
      val m = manifest(dir, v)
      if (Files.exists(m))
        new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).toSeq
      else Seq.empty
    }.toSet
    (0L until keepFrom).foreach { v =>
      val m = manifest(dir, v)
      if (Files.exists(m)) {
        new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .foreach { rel =>
            if (!keep.contains(rel))
              Files.deleteIfExists(root(dir).resolve(rel))
          }
        Files.delete(m)
      }
    }
  }
}
