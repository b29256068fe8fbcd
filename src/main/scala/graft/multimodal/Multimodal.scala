package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, typed Datasets,
  * per-partition batched execution, partitioning strategy. IMAGE
  * decode/resize is real, via the JDK's own `javax.imageio`
  * (PNG/JPEG/GIF/BMP): header-only metadata parse, full-decode
  * rescale + PNG re-encode. AUDIO metadata is real too, via
  * `javax.sound.sampled` (WAV/AIFF/AU header parse → format,
  * channels, sample rate, frame count → duration). VIDEO CONTAINER
  * metadata is real as well — a hand-rolled pure-JDK byte parser for
  * MP4 (ISO BMFF `moov`/`mvhd`/`tkhd`) and RIFF-AVI (`avih`) headers.
  * Video PIXEL decode and sample-level audio decode don't exist in
  * the JDK (and this container ships no media libraries), so those
  * calls are STUBBED with deterministic byte-derived fakes — each
  * marked `STUB:` and isolated behind [[MediaCodec]], so swapping in
  * a real decoder (javacv, ffmpeg-cli) touches exactly one object.
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

  /** Pixel stats for one decoded video frame (r13 — real for MJPEG
    * AVIs): container frame index, decoded dims, and the frame's mean
    * luminance bucketed to 64 units (round(mean/64) — wide enough
    * that JPEG loss can't move a designed fixture across buckets).
    */
  case class VideoFrameStat(mediaId: Long, frameIdx: Int,
                            width: Int, height: Int, lumaBucket: Int)

  /** An input media row: id + type + raw bytes. */
  case class MediaRecord(mediaId: Long, mediaType: String, content: Array[Byte])

  /** Per-channel waveform statistics from a REAL PCM sample decode
    * (r13 — the audio half of the former sample-decode stub). All
    * ratios are of full scale: peak = max |s|/fullScale, rms =
    * sqrt(mean s²)/fullScale, clipRate = fraction of samples at the
    * representable extremes.
    */
  case class AudioStats(mediaId: Long, channel: Int, nFrames: Long,
                        peak: Double, rms: Double, clipRate: Double)

  /** One channel's accumulated stats, before the media id is known
    * (the codec layer sees bytes, not records). */
  case class AudioChannelStats(channel: Int, nFrames: Long,
                               peak: Double, rms: Double, clipRate: Double)

  /** The codec boundary. IMAGES decode for real through the JDK's
    * `javax.imageio` (PNG/JPEG/GIF/BMP ship with every JVM — no
    * external library): [[decodeMeta]] reads width/height/format/bands
    * from the container header WITHOUT decoding pixels, and
    * [[resizeImage]] does a full pixel decode → `BufferedImage`
    * rescale → PNG re-encode. AUDIO metadata decodes for real through
    * `javax.sound.sampled` ([[audioHeader]]: WAV/AIFF/AU container
    * headers → format/channels/rate/frames, no sample decode). VIDEO
    * container metadata decodes for real through the pure-JDK
    * MP4/RIFF-AVI byte parser ([[videoHeader]] — no JDK video CODEC
    * exists, but header layout is public spec). Pixel/sample decode
    * work and blobs that fail to parse fall back to the deterministic
    * byte-derived STUBs below, each marked `STUB:`.
    */
  object MediaCodec {

    // ImageIO defaults to spilling ImageInputStreams to temp files;
    // executors decode thousands of in-memory blobs, so force the
    // memory-backed stream (class-load-time, once per JVM)
    javax.imageio.ImageIO.setUseCache(false)

    /** Real header parse: (format, width, height, bands) without
      * decoding pixel data — at 100 TB of media the metadata pass
      * must never pay the full decode. None if no installed reader
      * recognizes the bytes.
      */
    private[multimodal] def imageHeader(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
      import javax.imageio.ImageIO
      val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
      if (iis == null) return None
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis, true, true)
            val w = rd.getWidth(0)
            val h = rd.getHeight(0)
            val bands = {
              val its = rd.getImageTypes(0)
              if (its.hasNext) its.next().getNumBands else 0
            }
            Some((rd.getFormatName.toLowerCase(java.util.Locale.ROOT), w, h, bands))
          } finally rd.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }

    /** True when every byte (up to the first 512) is printable ASCII
      * or tab/LF/CR — the standard binary sniff. Text standing in
      * for blobs must NEVER reach the real codec: a document whose
      * prose merely BEGINS with "GIF89a" or "BM" would otherwise be
      * accepted by the JDK's GIF/BMP readers and parsed into
      * garbage dimensions (their magics are pure ASCII and their
      * header fields decode from any bytes without throwing) —
      * review-caught. Real containers always carry control bytes in
      * the first half KiB (PNG's 0x1A signature byte, length/dims
      * fields, compressed data), so this misclassifies nothing.
      */
    private[multimodal] def printableText(b: Array[Byte]): Boolean = {
      var i = 0
      val n = math.min(b.length, 512)
      while (i < n) {
        val c = b(i) & 0xff
        if (c < 0x20 && c != 0x09 && c != 0x0a && c != 0x0d) return false
        i += 1
      }
      true
    }

    /** Real audio header parse via the JDK's own `javax.sound.sampled`
      * (WAV/AIFF/AU readers ship with every JVM — no external
      * library): (format, channels, sampleRate, frameLength) WITHOUT
      * decoding samples. `AudioSystem.getAudioFileFormat` reads only
      * the container header — at 100 TB of audio the metadata pass
      * must never pay a sample decode. None if no installed reader
      * recognizes the bytes, or if the header leaves frame count /
      * rate unspecified (NOT_SPECIFIED = −1 — a duration computed
      * from those would be garbage).
      */
    private[multimodal] def audioHeader(b: Array[Byte]): Option[(String, Int, Float, Long)] =
      try {
        // ByteArrayInputStream supports the mark/reset the sniffing
        // readers require; no stream is left open (header-only read)
        val aff = javax.sound.sampled.AudioSystem
          .getAudioFileFormat(new java.io.ByteArrayInputStream(b))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        if (frames < 0 || fmt.getSampleRate <= 0 || fmt.getChannels <= 0) None
        else Some((aff.getType.getExtension.toLowerCase(java.util.Locale.ROOT),
          fmt.getChannels, fmt.getSampleRate, frames))
      } catch { case _: Exception => None }

    /** REAL PCM sample decode via the JDK's own `javax.sound.sampled`
      * frame reader (r13 — closes the audio half of the sample-decode
      * stub; video pixels remain the only stub). Reads every frame of
      * an 8- or 16-bit PCM stream (WAV/AU/AIFF — whatever the
      * installed readers parse, both endiannesses, signed and the WAV
      * 8-bit unsigned convention) and folds per-channel waveform
      * stats in one pass: peak (max |s| / full scale), RMS
      * (sqrt of mean square / full scale), clip rate (samples at the
      * representable extremes). The mean-square accumulation is EXACT:
      * sample squares are integers ≤ 2³⁰ and any realistic blob keeps
      * the running sum far below 2⁵³, so the result is deterministic
      * across JVMs and platforms — which is what lets the oracle state
      * micros-rounded ground truth as literals.
      *
      * None for non-PCM encodings, exotic bit depths, unrecognized
      * containers, or zero-frame streams — the operator drops such
      * records rather than fabricating stats (a corrupt blob must not
      * poison a 100 TB aggregate; the header pass still counts it).
      */
    private[multimodal] def audioSamples(b: Array[Byte]): Option[Seq[AudioChannelStats]] =
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(b))
        try {
          import javax.sound.sampled.AudioFormat
          val fmt = ais.getFormat
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
          val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
          val frameSize = fmt.getFrameSize
          if ((!signed && !unsigned) || (bits != 8 && bits != 16) ||
              ch <= 0 || frameSize != ch * bits / 8) None
          else {
            val be = fmt.isBigEndian
            val data = ais.readAllBytes()
            val nFrames = data.length / frameSize
            // a truncated payload means the blob is corrupt — drop
            // the record rather than silently computing stats over
            // the prefix (advisor r13). AudioInputStream.read rounds
            // down to whole frames itself, so a trailing partial
            // frame surfaces as FEWER decoded frames than the header
            // declares (getFrameLength; NOT_SPECIFIED = unknown —
            // nothing to check against), with the modulo guard kept
            // as defense for readers that hand back raw bytes.
            val declared = ais.getFrameLength
            if (nFrames == 0 || data.length % frameSize != 0 ||
                (declared >= 0 && nFrames.toLong != declared)) None
            else {
              val bps = bits / 8
              val fullScale = if (bits == 16) 32768.0 else 128.0
              val sumSq = new Array[Double](ch)
              val peak = new Array[Int](ch)
              val clip = new Array[Long](ch)
              var f = 0
              while (f < nFrames) {
                var c = 0
                while (c < ch) {
                  val off = (f * ch + c) * bps
                  val s =
                    if (bits == 16) {
                      val v =
                        if (be) ((data(off) << 8) | (data(off + 1) & 0xff))
                        else ((data(off + 1) << 8) | (data(off) & 0xff))
                      if (v == 32767 || v == -32768) clip(c) += 1
                      v
                    } else {
                      val v =
                        if (unsigned) (data(off) & 0xff) - 128
                        else data(off).toInt
                      if (v == 127 || v == -128) clip(c) += 1
                      v
                    }
                  val a = if (s < 0) -s else s
                  if (a > peak(c)) peak(c) = a
                  sumSq(c) += s.toDouble * s.toDouble
                  c += 1
                }
                f += 1
              }
              Some((0 until ch).map(c => AudioChannelStats(
                channel = c,
                nFrames = nFrames.toLong,
                peak = peak(c) / fullScale,
                rms = math.sqrt(sumSq(c) / nFrames) / fullScale,
                clipRate = clip(c).toDouble / nFrames)))
            }
          }
        } finally ais.close()
      } catch { case _: Exception => None }

    // ---- real video-CONTAINER metadata (pure-JDK byte parse) ----
    // No JDK video codec exists (pixel decode stays stubbed), but
    // container metadata is plain byte layout per public specs:
    // ISO/IEC 14496-12 for MP4 (ftyp; moov/mvhd timescale+duration;
    // trak/tkhd 16.16 fixed-point dims), the Microsoft RIFF spec for
    // AVI (LIST hdrl → avih MainAVIHeader). Header-only: the walk
    // skips over mdat/movi payloads by their declared sizes, so at
    // 100 TB of video the metadata pass never touches sample data.

    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def le32(b: Array[Byte], i: Int): Long =
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
        ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
    private def fourcc(b: Array[Byte], i: Int): String =
      if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")

    /** (format, width, height, durationMs, streamCount) from an MP4
      * or RIFF-AVI container header; None for anything else. All
      * offsets bounds-checked; a malformed size field aborts the
      * parse rather than scanning past the declared region.
      */
    private[multimodal] def videoHeader(b: Array[Byte]): Option[(String, Int, Int, Long, Int)] =
      if (fourcc(b, 4) == "ftyp") mp4Header(b)
      else if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") aviHeader(b)
      else None

    private def mp4Header(b: Array[Byte]): Option[(String, Int, Int, Long, Int)] = {
      // top-level box walk → moov payload bounds
      var off = 0L
      var moovS = -1; var moovE = -1
      while (off + 8 <= b.length && moovS < 0) {
        val size0 = be32(b, off.toInt)
        val typ = fourcc(b, off.toInt + 4)
        var hdr = 8L
        val size =
          if (size0 == 1L) {
            if (off + 16 > b.length) return None
            hdr = 16L; be64(b, off.toInt + 8)
          } else if (size0 == 0L) b.length - off
          else size0
        if (size < hdr || off + size > b.length) return None
        if (typ == "moov") { moovS = (off + hdr).toInt; moovE = (off + size).toInt }
        off += size
      }
      if (moovS < 0) return None
      // moov children: mvhd once (timescale/duration), trak* (tkhd
      // dims; first track with a nonzero width is the video track —
      // audio tkhd carries 0×0 per the spec)
      var timescale = 0L; var duration = -1L
      var w = 0; var h = 0; var tracks = 0
      var o = moovS
      while (o + 8 <= moovE) {
        val size0 = be32(b, o)
        val typ = fourcc(b, o + 4)
        var hdr = 8
        val size =
          if (size0 == 1L) { if (o + 16 > moovE) return None; hdr = 16; be64(b, o + 8) }
          else if (size0 == 0L) (moovE - o).toLong
          else size0
        if (size < hdr || o + size > moovE) return None
        val p = o + hdr
        typ match {
          case "mvhd" =>
            if (p + 4 > moovE) return None
            val v = b(p) & 0xff
            if (v == 0) {
              if (p + 20 > moovE) return None
              timescale = be32(b, p + 12); duration = be32(b, p + 16)
            } else {
              if (p + 32 > moovE) return None
              timescale = be32(b, p + 20); duration = be64(b, p + 24)
            }
          case "trak" =>
            tracks += 1
            // child walk for tkhd
            var q = p
            val trakE = (o + size).toInt
            while (q + 8 <= trakE) {
              val cs0 = be32(b, q)
              val ct = fourcc(b, q + 4)
              val cs = if (cs0 == 0L) (trakE - q).toLong else cs0
              if (cs < 8 || q + cs > trakE) return None
              if (ct == "tkhd") {
                val tp = q + 8
                if (tp + 1 > trakE) return None
                val v = b(tp) & 0xff
                val wOff = if (v == 0) tp + 76 else tp + 88
                if (wOff + 8 > trakE) return None
                val tw = (be32(b, wOff) >> 16).toInt // 16.16 fixed
                val th = (be32(b, wOff + 4) >> 16).toInt
                if (w == 0 && tw > 0) { w = tw; h = th }
              }
              q += cs.toInt
            }
          case _ => ()
        }
        o += size.toInt
      }
      if (timescale <= 0 || duration < 0) return None
      Some(("mp4", w, h, duration * 1000L / timescale, tracks))
    }

    /** The ONE RIFF sub-chunk walk (shared by [[aviHeader]] and
      * [[aviMjpegFrameSpans]], at every nesting level): invokes
      * `f(chunkId, payloadStart, payloadSize)` per chunk in
      * [start, end), stepping by the even-padded declared size.
      * `f` returns false to stop early (found what it wanted);
      * returns false when a declared size runs past `end` — the
      * malformed-abort every caller must treat as "not this format".
      */
    private def riffWalk(b: Array[Byte], start: Int, end: Int)(
        f: (String, Int, Int) => Boolean): Boolean = {
      var o = start
      while (o + 8 <= end) {
        val id = fourcc(b, o)
        val sz = le32(b, o + 4)
        if (sz < 0 || o + 8 + sz > end) return false
        if (!f(id, o + 8, sz.toInt)) return false
        o += (8 + sz + (sz & 1)).toInt // RIFF chunks pad to even
      }
      true
    }

    private def aviHeader(b: Array[Byte]): Option[(String, Int, Int, Long, Int)] = {
      var res: Option[(String, Int, Int, Long, Int)] = None
      riffWalk(b, 12, b.length) { (id, ps, sz) =>
        if (id == "LIST" && sz >= 4 && fourcc(b, ps) == "hdrl") {
          riffWalk(b, ps + 4, ps + sz) { (cid, d, csz) =>
            if (cid == "avih" && csz >= 40) {
              val usPerFrame = le32(b, d)
              val totalFrames = le32(b, d + 16)
              val streams = le32(b, d + 24)
              val w = le32(b, d + 32).toInt
              val h = le32(b, d + 36).toInt
              res = Some(("avi", w, h, totalFrames * usPerFrame / 1000L,
                streams.toInt))
              false // found
            } else true
          }
          false // first hdrl decides (res set, or absent/malformed avih)
        } else true
      }
      res
    }

    /** Image/audio/video metadata via the REAL header parses
      * (`javax.imageio` / `javax.sound.sampled` / the pure-JDK
      * MP4+AVI container parser above); text-sniffed and unparseable
      * blobs take the byte-derived stub.
      */
    def decodeMeta(r: MediaRecord): MediaMeta = {
      if (r.mediaType == "image" && !printableText(r.content)) {
        imageHeader(r.content) match {
          case Some((fmt, w, h, bands)) =>
            return MediaMeta(r.mediaId, "image", r.content.length.toLong,
              fmt, w, h, durationMs = 0L, channels = bands)
          case None => () // not a real image container — stub below
        }
      }
      if (r.mediaType == "audio" && !printableText(r.content)) {
        audioHeader(r.content) match {
          case Some((fmt, channels, rate, frames)) =>
            return MediaMeta(r.mediaId, "audio", r.content.length.toLong,
              fmt, width = 0, height = 0,
              durationMs = math.round(frames * 1000.0 / rate),
              channels = channels)
          case None => () // not a real audio container — stub below
        }
      }
      if (r.mediaType == "video" && !printableText(r.content)) {
        videoHeader(r.content) match {
          case Some((fmt, w, h, durMs, streams)) =>
            // `channels` carries the container's stream count — the
            // natural analog of audio channel count for a muxed file
            return MediaMeta(r.mediaId, "video", r.content.length.toLong,
              fmt, width = w, height = h, durationMs = durMs,
              channels = streams)
          case None => () // not a real video container — stub below
        }
      }
      decodeMetaStub(r)
    }

    /** STUB: pseudo metadata from the first bytes of the blob — the
      * fallback for blobs every real header parse rejects (text
      * standing in for media, truncated/corrupt containers).
      */
    private[multimodal] def decodeMetaStub(r: MediaRecord): MediaMeta = {
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

    /** REAL image rescale: full `ImageIO` decode, aspect-preserving
      * scale so max(width, height) == maxDim (round-half-up on the
      * short edge, floor 1 px), bilinear `Graphics2D` redraw, PNG
      * re-encode. Non-image records pass through UNTOUCHED (an image
      * resize pass must never corrupt audio/video payloads); image
      * blobs no installed reader accepts (including text-sniffed
      * stand-ins — same gate as [[decodeMeta]]) fall back to the
      * byte-budget stub at 3·maxDim² bytes (the RGB byte count of a
      * maxDim-square image).
      */
    def resizeImage(r: MediaRecord, maxDim: Int): MediaRecord = {
      require(maxDim > 0, s"maxDim must be positive, got $maxDim")
      if (r.mediaType != "image") return r
      if (printableText(r.content)) return resize(r, 3 * maxDim * maxDim)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
        catch { case _: Exception => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
        return resize(r, 3 * maxDim * maxDim)
      val m = math.max(img.getWidth, img.getHeight).toDouble
      val nw = math.max(1, math.round(img.getWidth * maxDim / m).toInt)
      val nh = math.max(1, math.round(img.getHeight * maxDim / m).toInt)
      val out = new java.awt.image.BufferedImage(
        nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      r.copy(content = bos.toByteArray)
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

    /** Frame payload SPANS (offset, length) from a RIFF-AVI whose
      * FIRST MJPG video stream declares the MJPG handler (r13 — the
      * first REAL video PIXEL path: in the MJPEG convention each
      * 'NNdc'/'NNdb' chunk under LIST movi is a complete JPEG image,
      * and JPEG decode ships with every JVM). Spans, not copies: the
      * caller samples every stride-th frame, so copying every payload
      * up front would waste ~ (1 − 1/stride) of the blob's video
      * bytes in dead allocations (review r13).
      *
      * Spec-faithful details (review r13): frames may ride inside
      * nested LIST 'rec ' groups (the standard interleaved authoring
      * layout) — the walk recurses into them; and chunk ids carry the
      * STREAM index ('01dc' = stream 1), so only the MJPG stream's
      * own frames are collected — a muxed second stream can neither
      * interleave foreign frames nor shift container indices.
      *
      * None for non-AVI bytes, no MJPG video stream, a malformed
      * chunk walk, or any claimed frame that doesn't start with the
      * JPEG SOI marker — the caller falls back to the byte-slice
      * stub, which remains the declared limit for INTER-FRAME codecs
      * (H.264 etc.: no JDK codec exists).
      */
    private[multimodal] def aviMjpegFrameSpans(b: Array[Byte]): Option[Vector[(Int, Int)]] = {
      if (!(fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ")) return None
      // PASS 1 — which stream (if any) is MJPG video. A separate pass
      // so movi placement doesn't matter: lenient demuxers (and the
      // previous single-pass version of this parser) accept
      // movi-before-hdrl, and a one-pass scan would silently collect
      // nothing there (review r13).
      var mjpgStream = -1
      var nStreams = 0
      riffWalk(b, 12, b.length) { (id, ps, sz) =>
        if (id == "LIST" && sz >= 4 && fourcc(b, ps) == "hdrl") {
          riffWalk(b, ps + 4, ps + sz) { (cid, cps, csz) =>
            if (cid == "LIST" && csz >= 4 && fourcc(b, cps) == "strl") {
              val idx = nStreams
              nStreams += 1
              riffWalk(b, cps + 4, cps + csz) { (c2, p2, s2) =>
                if (c2 == "strh" && s2 >= 8 && fourcc(b, p2) == "vids" &&
                    fourcc(b, p2 + 4) == "MJPG" && mjpgStream < 0)
                  mjpgStream = idx
                true
              }
            } else true
          }
          false // first hdrl decides
        } else true
      }
      if (mjpgStream < 0) return None
      // AVI chunk ids encode the stream index in exactly two digits
      // ("##dc"), so the format caps at stream 99; a higher index
      // would render 5 chars and never match a 4-char chunk id
      // (advisor r13) — bail explicitly instead of silently falling
      // back to the byte-slice stub
      if (mjpgStream > 99) return None
      // PASS 2 — collect that stream's frames. Chunk ids are constant
      // across the walk: format them ONCE, not per chunk (review r13).
      val dcId = "%02d".format(mjpgStream) + "dc"
      val dbId = "%02d".format(mjpgStream) + "db"
      var frames = Vector.empty[(Int, Int)]
      var badFrame = false
      // rec groups don't nest per the AVI spec: depth 1 is the
      // interleaved layout, anything deeper is malformed. The bound
      // is also the stack-safety guard: without it a crafted blob of
      // nested 'rec ' headers (~12 bytes/level) drives unbounded
      // recursion into StackOverflowError — an Error no corrupt-input
      // boundary catch sees (review r13).
      def moviBody(start: Int, end: Int, depth: Int): Boolean =
        riffWalk(b, start, end) { (id, ps, sz) =>
          if (id == "LIST" && sz >= 4 && fourcc(b, ps) == "rec ")
            depth < 1 && moviBody(ps + 4, ps + sz, depth + 1)
          else if (sz >= 2 && (id == dcId || id == dbId)) {
            if ((b(ps) & 0xff) != 0xff || (b(ps + 1) & 0xff) != 0xd8) {
              badFrame = true; false
            } else { frames :+= ((ps, sz)); true }
          } else true
        }
      val ok = riffWalk(b, 12, b.length) { (id, ps, sz) =>
        if (id == "LIST" && sz >= 4 && fourcc(b, ps) == "movi")
          moviBody(ps + 4, ps + sz, 0)
        else true
      }
      if (ok && !badFrame && frames.nonEmpty) Some(frames) else None
    }

    /** [[aviMjpegFrameSpans]] with the payloads materialized — the
      * all-frames view (tests; callers that really need every frame).
      */
    private[multimodal] def aviMjpegFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] =
      aviMjpegFrameSpans(b).map(_.map { case (off, len) =>
        java.util.Arrays.copyOfRange(b, off, off + len)
      })

    /** Frame sampling. REAL for MJPEG AVIs ([[aviMjpegFrames]]): every
      * `stride`-th CONTAINER frame as its complete JPEG payload, with
      * `frameIdx` the container frame index (the meaningful one).
      * STUB otherwise: every `stride`-th 1 KiB byte slice, with
      * `frameIdx` the sampled ordinal (slices carry no container
      * semantics to index by).
      */
    def sampleFrames(r: MediaRecord, stride: Int): Iterator[MediaFrame] = {
      // stride 0 would loop forever on offset 0; negatives crash in
      // copyOfRange (review-caught) — fail fast
      require(stride > 0, s"frame stride must be positive, got $stride")
      if (r.mediaType == "video" && !printableText(r.content)) {
        aviMjpegFrameSpans(r.content) match {
          case Some(spans) =>
            // copy ONLY the sampled frames (spans → bytes here, so a
            // stride of k skips k-1 of every k allocations)
            return Iterator.range(0, spans.length, stride).map { i =>
              val (off, len) = spans(i)
              MediaFrame(r.mediaId, i,
                java.util.Arrays.copyOfRange(r.content, off, off + len))
            }
          case None => () // not MJPEG — stub below
        }
      }
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

    /** Decode ONE sampled frame's pixels (real: the MJPEG path emits
      * JPEG payloads ImageIO reads) into (width, height, luma bucket
      * = round(mean luma / 64)). The luma read branches on the
      * decoded image's band count — each arm avoiding the OTHER
      * arm's trap (both review-caught, r13):
      *
      *  - 1 band (grayscale): raster band 0 IS the stored gray —
      *    read it directly. (`getRGB` here would gamma-convert the
      *    gray colorspace to sRGB: a stored 16 reads back ~72,
      *    poisoning the designed fixtures' closed-form truth.)
      *  - multi-band (color): Rec.601 over `getRGB`'s sRGB channels
      *    with integer weights (299·R + 587·G + 114·B)/1000. (Raster
      *    band 0 here is the RED channel, not luminance: a solid
      *    pure-red frame would read bucket 4 instead of its true ~1.)
      *
      * None for frames that aren't a decodable image — the byte-slice
      * stub's output, text, corrupt payloads — so corrupt frames
      * degrade per-record.
      */
    private[multimodal] def frameStats(frame: Array[Byte]): Option[(Int, Int, Int)] = {
      if (frame.length < 2 || printableText(frame)) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
        catch { case _: Exception => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // the raw-band fast path is gated on TYPE_BYTE_GRAY exactly —
        // NOT on band count: an indexed GIF/PNG also has a 1-band
        // raster whose band 0 is the PALETTE INDEX, and 16-bit gray
        // samples run to 65535, both of which would bucket garbage
        // (review r13); everything non-byte-gray goes through the
        // sRGB conversion below
        var sum = 0L
        if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += 1000L * raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
        } else {
          // bulk row reads: per-pixel getRGB pays the ColorModel
          // dispatch per call — ~10x on the per-frame hot path
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val rgb = row(x)
              sum += 299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
        }
        val mean = sum.toDouble / (1000.0 * w.toLong * h)
        Some((w, h, math.round(mean / 64.0).toInt))
      }
    }
  }

  /** Decode metadata for every media row — batched per partition so a
    * real codec's init cost amortizes (the mapPartitions boundary is
    * the batch: one iterator per partition, not one call per row).
    */
  /** Records with a NULL blob (missing media — a plain reality in
    * any at-scale media table) are dropped at every operator
    * boundary, same contract as `Tables.embeddingsFinite`: a single
    * missing blob must not NPE a 100 TB pass (fuzz-caught: a NULL
    * content column crashed all three media queries). Scan-side
    * `IS NOT NULL` predicate — pushes to the reader, free.
    */
  private def withContent(media: Dataset[MediaRecord]): Dataset[MediaRecord] =
    media.filter(col("content").isNotNull)

  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    withContent(media).mapPartitions { it =>
      // SPI resolution INSIDE the task (once per partition): a
      // deploy-time [[MediaDecoder]] — ServiceLoader jar or
      // programmatic register — takes each record first; the
      // pure-JDK default handles everything it declines.
      val spi = MediaDecoder.current
      it.map(r => spi.flatMap(_.decodeMeta(r))
        .getOrElse(MediaCodec.decodeMeta(r)))
    }
  }

  /** REAL per-channel waveform stats over every decodable PCM audio
    * blob ([[MediaCodec.audioSamples]]), batched per partition like
    * every decode pass. flatMap shape: one row per (record, channel);
    * text-sniffed stand-ins and undecodable blobs produce NO rows —
    * the same degrade-per-record contract as image resize, stated by
    * the oracle as "fixtures only". A deploy-time [[MediaDecoder]]
    * (e.g. an ffmpeg wrapper adding MP3/FLAC) takes each record
    * first via its `audioStats` hook.
    *
    * Scale shape: narrow transform appended to the scan — blobs never
    * shuffle; only the 6-field stats rows travel downstream.
    */
  def audioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    withContent(media)
      .filter(col("mediaType") === "audio")
      .mapPartitions { it =>
        val spi = MediaDecoder.current
        it.flatMap { r =>
          spi.flatMap(_.audioStats(r)).orElse {
            if (MediaCodec.printableText(r.content)) None
            else MediaCodec.audioSamples(r.content).map(_.map(cs =>
              AudioStats(r.mediaId, cs.channel, cs.nFrames,
                cs.peak, cs.rms, cs.clipRate)))
          }.getOrElse(Seq.empty)
        }
      }
  }

  /** Feature extraction with the same batch shape. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    withContent(media).mapPartitions { it =>
      val spi = MediaDecoder.current
      it.map(r => spi.flatMap(_.extractFeatures(r, dim))
        .getOrElse(MediaCodec.extractFeatures(r, dim)))
    }
  }

  /** Frame sampling — flatMap shape (0..n frames per input row). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    withContent(media).mapPartitions { it =>
      val spi = MediaDecoder.current
      it.flatMap(r => spi.flatMap(_.sampleFrames(r, stride))
        .getOrElse(MediaCodec.sampleFrames(r, stride)))
    }
  }

  /** REAL per-frame pixel stats over every decodable video blob
    * (r13): sample frames through the SPI-aware [[sampleFrames]]
    * pipeline — REAL complete-JPEG frames for MJPEG AVIs, whatever a
    * deploy codec's `sampleFrames` hook emits otherwise — then decode
    * each frame's pixels ([[MediaCodec.frameStats]]). Frames that
    * aren't decodable images (the byte-slice stub's output for
    * non-MJPEG containers, text stand-ins, corrupt payloads) produce
    * NO rows — the same degrade-per-record contract as audioStats.
    *
    * Scale shape: two narrow stages appended to the scan (frame
    * extraction, per-frame decode); blobs and frames never shuffle —
    * only the 5-field stats rows travel downstream.
    */
  def videoFrameStats(media: Dataset[MediaRecord], stride: Int = 2): Dataset[VideoFrameStat] = {
    import media.sparkSession.implicits._
    sampleFrames(media.filter(col("mediaType") === "video"), stride)
      .mapPartitions { it =>
        it.flatMap { fr =>
          MediaCodec.frameStats(fr.frame).map { case (w, h, luma) =>
            VideoFrameStat(fr.mediaId, fr.frameIdx, w, h, luma)
          }
        }
      }
  }

  /** Resize every blob to a fixed byte budget — same batched
    * per-partition shape as decode (a real impl rescales pixels; the
    * stub truncates/zero-pads deterministically).
    */
  def resize(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    withContent(media).mapPartitions { it =>
      val spi = MediaDecoder.current
      it.map(r => spi.flatMap(_.resize(r, targetBytes))
        .getOrElse(MediaCodec.resize(r, targetBytes)))
    }
  }

  /** REAL image rescale ([[MediaCodec.resizeImage]]: ImageIO decode →
    * bilinear redraw → PNG re-encode), batched per partition so the
    * codec warm-up amortizes. Undecodable blobs degrade to the
    * byte-budget stub — the shape a production pipeline wants, since
    * a single corrupt blob must not fail a 100 TB pass.
    */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    withContent(media).mapPartitions { it =>
      val spi = MediaDecoder.current
      it.map(r => spi.flatMap(_.resizeImage(r, maxDim))
        .getOrElse(MediaCodec.resizeImage(r, maxDim)))
    }
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
