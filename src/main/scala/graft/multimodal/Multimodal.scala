package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, typed Datasets,
  * per-partition batched execution, partitioning strategy — while the
  * actual codec calls are STUBBED with deterministic fakes (this
  * container ships no image/audio libraries). Every stub is marked
  * `STUB:` and isolated behind [[MediaCodec]], so swapping in a real
  * decoder (javacv, TwelveMonkeys, ffmpeg-cli) touches exactly one
  * object.
  *
  * Execution model notes (the part that matters at 100 TB):
  *  - decode work runs via `mapPartitions` so per-partition setup
  *    (codec init, native buffers) amortizes across rows — the Scala
  *    analog of a Pandas-batch UDF;
  *  - media blobs never enter a shuffle: decode/feature-extract are
  *    NARROW transforms appended to the scan, and downstream
  *    aggregations carry only the small typed outputs;
  *  - for skewed blob sizes, `repartitionByBytes` pre-balances
  *    partitions by declared byte length rather than row count.
  */
object Multimodal {

  /** Typed metadata extracted by "decoding" a media blob. */
  case class MediaMeta(
      mediaId: Long,
      mediaType: String, // image | audio | video
      byteLen: Long,
      format: String,
      width: Int, // image/video; 0 otherwise
      height: Int,
      durationMs: Long, // audio/video; 0 for stills
      channels: Int)

  /** Fixed-dimension feature vector per media item. */
  case class MediaFeatures(mediaId: Long, dim: Int, features: Array[Float])

  /** One sampled video frame (as an opaque blob + index). */
  case class MediaFrame(mediaId: Long, frameIdx: Int, frame: Array[Byte])

  /** An input media row: id + type + raw bytes. */
  case class MediaRecord(mediaId: Long, mediaType: String, content: Array[Byte])

  /** The codec boundary. Everything below is a deterministic fake
    * over the blob bytes — byte-derived, so results are stable across
    * runs/executors and testable — NOT a real decoder.
    */
  object MediaCodec {

    /** STUB: derive pseudo metadata from the first bytes of the blob
      * (a real impl would parse the container header).
      */
    def decodeMeta(r: MediaRecord): MediaMeta = {
      val b = r.content
      def byteAt(i: Int): Int = if (b.length > i) b(i) & 0xff else 0
      val fakeFormat = r.mediaType match {
        case "image" => if (byteAt(0) % 2 == 0) "png" else "jpeg"
        case "audio" => if (byteAt(0) % 2 == 0) "wav" else "flac"
        case _ => "mp4"
      }
      MediaMeta(
        mediaId = r.mediaId,
        mediaType = r.mediaType,
        byteLen = b.length.toLong,
        format = fakeFormat,
        width = if (r.mediaType == "audio") 0 else 16 * (1 + byteAt(1) % 120),
        height = if (r.mediaType == "audio") 0 else 16 * (1 + byteAt(2) % 68),
        durationMs = if (r.mediaType == "image") 0L else 1000L * (1 + byteAt(3) % 300),
        channels = 1 + byteAt(4) % 2)
    }

    /** STUB: fixed-dim feature vector derived from a rolling hash of
      * the bytes (a real impl would run an encoder model).
      */
    def extractFeatures(r: MediaRecord, dim: Int): MediaFeatures = {
      val f = new Array[Float](dim)
      var h = 0x9e3779b97f4a7c15L ^ r.mediaId
      var i = 0
      while (i < r.content.length) {
        h = (h ^ (r.content(i) & 0xffL)) * 0x100000001b3L
        f(i % dim) += ((h >>> 40).toInt % 1000) / 1000.0f
        i += 1
      }
      MediaFeatures(r.mediaId, dim, f)
    }

    /** STUB: "resize" = deterministic truncation/padding of the blob
      * to the target byte budget (a real impl would rescale pixels).
      */
    def resize(r: MediaRecord, targetBytes: Int): MediaRecord =
      r.copy(content = java.util.Arrays.copyOf(r.content, targetBytes))

    /** STUB: sample every `stride`-th 1 KiB slice as a "frame". */
    def sampleFrames(r: MediaRecord, stride: Int): Iterator[MediaFrame] = {
      // stride 0 would loop forever on offset 0; negatives crash in
      // copyOfRange (review-caught) — fail fast
      require(stride > 0, s"frame stride must be positive, got $stride")
      val frameSize = 1024
      Iterator.from(0)
        .map(_ * stride * frameSize)
        .takeWhile(_ < r.content.length)
        .zipWithIndex
        .map { case (off, idx) =>
          MediaFrame(r.mediaId, idx,
            java.util.Arrays.copyOfRange(r.content,
              off, math.min(off + frameSize, r.content.length)))
        }
    }
  }

  /** Decode metadata for every media row — batched per partition so a
    * real codec's init cost amortizes (the mapPartitions boundary is
    * the batch: one iterator per partition, not one call per row).
    */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // STUB: a real impl would initialize the codec here, once per
      // partition, before draining the iterator.
      it.map(MediaCodec.decodeMeta)
    }
  }

  /** Feature extraction with the same batch shape. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(MediaCodec.extractFeatures(_, dim)))
  }

  /** Frame sampling — flatMap shape (0..n frames per input row). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.flatMap(MediaCodec.sampleFrames(_, stride)))
  }

  /** Resize every blob to a fixed byte budget — same batched
    * per-partition shape as decode (a real impl rescales pixels; the
    * stub truncates/zero-pads deterministically).
    */
  def resize(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(MediaCodec.resize(_, targetBytes)))
  }

  /** Size partition count by total blob bytes instead of row count —
    * with skewed media (a few 4K videos among thumbnails), row-count
    * sizing leaves stragglers. `targetBytes` is the partition byte
    * budget.
    *
    * Rows spread by hash(media_id): a uniform deterministic scatter,
    * so each partition's expected byte load is totalBytes/parts and
    * large blobs land independently of each other. (Range-
    * partitioning on blob length — the previous formulation — is the
    * OPPOSITE of balance: it clusters all the biggest blobs into the
    * same partition.) Residual imbalance is bounded by the single
    * largest blob, the floor for any row-granularity scheme.
    */
  def repartitionByBytes(media: DataFrame, totalBytes: Long,
                         targetBytes: Long = 128L << 20,
                         idCol: String = "mediaId"): DataFrame = {
    // default matches this module's own MediaRecord column (the
    // previous "media_id" default threw UNRESOLVED_COLUMN on every
    // DataFrame this module produces — review-caught)
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts, col(idCol))
  }

  /** Build a MediaRecord dataset from the driver testdata's documents
    * (text bytes standing in for blobs — the schema/partition shape
    * is what's exercised; real pipelines read binary parquet).
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mediaType"),
        encode(col("text"), "utf-8").as("content"))
      .as[MediaRecord]
  }
}
