package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Byte-exact planted video-container fixtures for the real
  * header-parse path ([[Multimodal.MediaCodec.videoHeader]]).
  *
  * No JDK video CODEC exists (pixel decode stays a declared stub),
  * but CONTAINER METADATA is pure byte layout, assembled here per the
  * PUBLIC specs — MP4: ISO/IEC 14496-12 ISO BMFF boxes (`ftyp`,
  * `moov`/`mvhd` timescale+duration, `trak`/`tkhd` 16.16
  * fixed-point dims); AVI: the Microsoft RIFF `LIST hdrl` /
  * `avih` MainAVIHeader (µs-per-frame, total frames, streams,
  * dwWidth/dwHeight). Same convention as [[AudioFixtures]]:
  * programmatic but byte-deterministic assembly, so every derived
  * value is a constant the DuckDB oracle states as ground truth
  * while Spark derives it by actually parsing the bytes.
  *
  * Ids continue the planted range: 900021+ above AudioFixtures'
  * 900011..13.
  */
object VideoFixtures {

  private def beBuf(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.BIG_ENDIAN)

  /** ISO BMFF box: 4-byte big-endian size (including the 8-byte
    * header) + 4-byte type + payload. */
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = beBuf(8 + payload.length)
    bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    parts.foreach(bos.write)
    bos.toByteArray
  }

  /** `mvhd` payload, version 0 (100 bytes) or 1 (112 bytes). */
  private def mvhd(version: Int, timescale: Int, duration: Long): Array[Byte] = {
    val bb = beBuf(if (version == 0) 100 else 112)
    bb.put(version.toByte).put(Array[Byte](0, 0, 0)) // version + flags
    if (version == 0)
      bb.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt)
    else
      bb.putLong(0L).putLong(0L).putInt(timescale).putLong(duration)
    bb.putInt(0x00010000) // rate 1.0
      .putShort(0x0100.toShort) // volume 1.0
      .put(new Array[Byte](10)) // reserved
      .put(identityMatrix)
      .put(new Array[Byte](24)) // pre_defined
      .putInt(2) // next_track_ID
    bb.array()
  }

  /** The unity transform matrix every spec example uses. */
  private def identityMatrix: Array[Byte] = {
    val bb = beBuf(36)
    bb.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    bb.array()
  }

  /** `tkhd` payload, version 0 (84 bytes): dims as 16.16 fixed point.
    * An audio track carries 0×0, exactly as the spec prescribes. */
  private def tkhd(trackId: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    val bb = beBuf(84)
    bb.put(0.toByte).put(Array[Byte](0, 0, 7)) // v0; enabled|in-movie|in-preview
      .putInt(0).putInt(0) // ctime/mtime
      .putInt(trackId)
      .putInt(0) // reserved
      .putInt(duration)
      .put(new Array[Byte](8)) // reserved
      .putShort(0).putShort(0) // layer, alternate_group
      .putShort(if (w == 0) 0x0100.toShort else 0) // volume: audio 1.0
      .putShort(0) // reserved
      .put(identityMatrix)
      .putInt(w << 16).putInt(h << 16)
    bb.array()
  }

  private def trak(trackId: Int, duration: Int, w: Int, h: Int): Array[Byte] =
    box("trak", box("tkhd", tkhd(trackId, duration, w, h)))

  private def ftyp: Array[Byte] = {
    val bb = beBuf(12)
    bb.put("isom".getBytes("US-ASCII")).putInt(0x200)
      .put("isom".getBytes("US-ASCII"))
    box("ftyp", bb.array())
  }

  /** Minimal valid MP4: ftyp + moov(mvhd, trak…) + a token mdat.
    * Durations are chosen so duration·1000/timescale is EXACT. */
  private[multimodal] def mp4(mvhdVersion: Int, timescale: Int, duration: Long,
      tracks: Seq[(Int, Int)]): Array[Byte] = {
    val traks = tracks.zipWithIndex.map { case ((w, h), i) =>
      trak(i + 1, duration.toInt, w, h)
    }
    concat(
      ftyp,
      box("moov", concat(box("mvhd", mvhd(mvhdVersion, timescale, duration)) +: traks: _*)),
      box("mdat", Array.tabulate(16)(i => ((i * 31) % 251).toByte)))
  }

  /** Minimal valid RIFF-AVI: RIFF("AVI ") + LIST(hdrl){avih} +
    * LIST(movi){} — all sizes little-endian per the RIFF spec. */
  private[multimodal] def avi(usPerFrame: Int, totalFrames: Int, streams: Int,
      w: Int, h: Int): Array[Byte] = {
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame)
      .putInt(w * h * 3 * (1000000 / math.max(usPerFrame, 1))) // dwMaxBytesPerSec
      .putInt(0) // dwPaddingGranularity
      .putInt(0x10) // dwFlags: AVIF_HASINDEX
      .putInt(totalFrames)
      .putInt(0) // dwInitialFrames
      .putInt(streams)
      .putInt(0) // dwSuggestedBufferSize
      .putInt(w).putInt(h)
      .put(new Array[Byte](16)) // dwReserved[4]
      .array()
    val hdrl = ByteBuffer.allocate(12 + 56 + 56 + 12)
      .order(ByteOrder.LITTLE_ENDIAN)
    hdrl.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII")).putInt(56).put(avih)
    val movi = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    movi.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("movi".getBytes("US-ASCII"))
    val body = concat(
      java.util.Arrays.copyOf(hdrl.array(), 12 + 56 + 8), movi.array())
    val out = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    out.array()
  }

  /** (mediaId, blob, format, width, height, durationMs, streams,
    * byteLen) — the literal truth the oracle VALUES rows state.
    *
    *  - 900021: single-track MP4, mvhd v0, timescale 600 / duration
    *    1200 → 2000 ms, 320×240. Bytes: ftyp 20 + moov 216 (mvhd 108
    *    + trak 100) + mdat 24 = 260.
    *  - 900022: 25 fps AVI (40000 µs/frame), 250 frames → 10000 ms,
    *    1 stream, 640×360. Bytes: RIFF hdr 12 + LIST hdrl 76 +
    *    LIST movi 12 = 100.
    *  - 900023: two-track MP4 (1920×1080 video + 0×0 audio), mvhd
    *    v1 (64-bit times), timescale 90000 / duration 270000 →
    *    3000 ms. Bytes: ftyp 20 + moov 328 (mvhd 120 + 2·trak 100)
    *    + mdat 24 = 372.
    */
  val expected: Seq[(Long, Array[Byte], String, Int, Int, Long, Int, Long)] = Seq(
    (900021L, mp4(0, 600, 1200L, Seq((320, 240))),
      "mp4", 320, 240, 2000L, 1, 260L),
    (900022L, avi(40000, 250, 1, 640, 360),
      "avi", 640, 360, 10000L, 1, 100L),
    (900023L, mp4(1, 90000, 270000L, Seq((1920, 1080), (0, 0))),
      "mp4", 1920, 1080, 3000L, 2, 372L))

  def records: Seq[Multimodal.MediaRecord] =
    expected.map { case (id, bytes, _, _, _, _, _, _) =>
      Multimodal.MediaRecord(id, "video", bytes)
    }

  // ---- MJPEG-in-AVI fixtures (r13: the real VIDEO PIXEL path, ----
  // ---- [[Multimodal.MediaCodec.aviMjpegFrames]])               ----

  private def leChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = payload.length & 1 // RIFF chunks pad to even
    val bb = ByteBuffer.allocate(8 + payload.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
    bb.array()
  }

  private def leList(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("LIST".getBytes("US-ASCII")).putInt(4 + payload.length)
      .put(typ.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  /** One solid-color JPEG frame via the JDK's own encoder — the one
    * encode path both frame kinds share (a future change, e.g. an
    * explicit JPEG quality, lands once). The gray fixtures' VALUES
    * are chosen mid-bucket (see [[mjpegExpected]]) so JPEG's
    * DC-quantization error (±a few units on a solid frame) can never
    * move a decoded mean across a 64-wide luma bucket — the oracle
    * literals are safe under any compliant encoder/decoder pair.
    */
  private def solidJpeg(w: Int, h: Int, imageType: Int,
                        c: java.awt.Color): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imageType)
    val g2 = img.createGraphics()
    try { g2.setColor(c); g2.fillRect(0, 0, w, h) } finally g2.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def jpegGray(w: Int, h: Int, gray: Int): Array[Byte] =
    solidJpeg(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
      new java.awt.Color(gray, gray, gray))

  /** One solid-COLOR JPEG frame (TYPE_3BYTE_BGR — what a real color
    * MJPEG camera produces): the luma-vs-band-0 spec case. */
  private[multimodal] def jpegColor(w: Int, h: Int, c: java.awt.Color): Array[Byte] =
    solidJpeg(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR, c)

  /** A spec-complete MJPEG AVI: RIFF("AVI ") + LIST(hdrl){avih,
    * LIST(strl){strh('vids'/'MJPG'), strf(BITMAPINFOHEADER)}} +
    * LIST(movi){'NNdc' JPEG per frame} — every frame a complete
    * JPEG image, per the MJPEG convention (25 fps).
    *
    * Three layout dials for the parser's spec-faithfulness tests
    * (review r13): `recDepth` nests every frame chunk inside that
    * many LIST 'rec ' groups (1 = the standard interleaved authoring
    * layout; ≥2 is out of spec — the parser must treat it as
    * malformed WITHOUT recursing to the nominal depth, the
    * stack-bomb guard); `leadingAudioStreams` inserts that many
    * non-video strl entries BEFORE the video one, so the video
    * stream is index N and its frame chunks are 'NNdc' — a parser
    * that hardcodes stream 0 finds nothing, and N ≥ 100 overflows
    * the two-digit AVI chunk-id convention entirely (the frame
    * chunks then carry a truncated junk id, because a real muxer
    * CANNOT express stream 100 — the parser must bail to the stub,
    * advisor r13); `moviFirst` emits movi BEFORE hdrl (out of spec
    * order, accepted by lenient demuxers — the parser's stream
    * discovery must not depend on list order).
    */
  private[multimodal] def mjpegAvi(w: Int, h: Int, grays: Seq[Int],
                                   recDepth: Int = 0,
                                   leadingAudioStreams: Int = 0,
                                   moviFirst: Boolean = false): Array[Byte] = {
    val n = grays.length
    val vidStream = leadingAudioStreams
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40000) // µs/frame: 25 fps
      .putInt(w * h * 3 * 25)
      .putInt(0).putInt(0)
      .putInt(n) // totalFrames
      .putInt(0)
      .putInt(leadingAudioStreams + 1) // streams
      .putInt(0)
      .putInt(w).putInt(h)
      .put(new Array[Byte](16))
      .array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII"))
      .put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0) // flags, priority, language
      .putInt(0) // initial frames
      .putInt(1).putInt(25) // scale, rate -> 25 fps
      .putInt(0) // start
      .putInt(n) // length in frames
      .putInt(0).putInt(-1).putInt(0) // suggested buffer, quality, sample size
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
      .array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40) // biSize
      .putInt(w).putInt(h)
      .putShort(1).putShort(24) // planes, bit count
      .put("MJPG".getBytes("US-ASCII")) // biCompression
      .putInt(w * h * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val videoStrl = leList("strl",
      concat(leChunk("strh", strh), leChunk("strf", strf)))
    val audioStrl = {
      // minimal non-video stream header: fccType 'auds', NONE handler
      val ash = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
        .put("auds".getBytes("US-ASCII"))
        .put("NONE".getBytes("US-ASCII"))
        .put(new Array[Byte](48))
        .array()
      leList("strl", leChunk("strh", ash))
    }
    val hdrl = leList("hdrl", concat(
      (leChunk("avih", avih) +:
        (Seq.fill(leadingAudioStreams)(audioStrl) :+ videoStrl)): _*))
    // RIFF chunk ids are exactly 4 bytes: stream ≥ 100 cannot be
    // expressed — truncate to keep the fixture structurally valid
    // RIFF (the id is then junk no demuxer matches, by construction)
    val dcId = ("%02d".format(vidStream) + "dc").take(4)
    val frameChunks = concat(grays.map(g => leChunk(dcId, jpegGray(w, h, g))): _*)
    val wrapped = (1 to recDepth).foldLeft(frameChunks)(
      (acc, _) => leList("rec ", acc))
    val movi = leList("movi", wrapped)
    val body = if (moviFirst) concat(movi, hdrl) else concat(hdrl, movi)
    val out = ByteBuffer.allocate(12 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    out.array()
  }

  /** (mediaId, blob, width, height, per-frame gray values). Grays sit
    * mid-bucket under round(mean/64): 16→0, 80→1, 144→2, 208→3 — each
    * ≥14 units from a bucket edge, far beyond solid-frame JPEG error.
    */
  val mjpegExpected: Seq[(Long, Array[Byte], Int, Int, Seq[Int])] = Seq(
    (900024L, mjpegAvi(48, 32, Seq(16, 80, 144, 208, 16, 80)),
      48, 32, Seq(16, 80, 144, 208, 16, 80)),
    (900025L, mjpegAvi(64, 48, Seq(208, 144, 80, 16)),
      64, 48, Seq(208, 144, 80, 16)))

  def mjpegRecords: Seq[Multimodal.MediaRecord] =
    mjpegExpected.map { case (id, bytes, _, _, _) =>
      Multimodal.MediaRecord(id, "video", bytes)
    }
}
