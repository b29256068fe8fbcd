package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Byte-exact planted audio fixtures for the real-codec path
  * ([[Multimodal.MediaCodec.audioHeader]] via `javax.sound.sampled`).
  *
  * Each blob is assembled per the PUBLIC container specs — WAV: the
  * canonical 44-byte RIFF/WAVE PCM header (Microsoft/IBM RIFF spec);
  * AU: the 24-byte Sun `.snd` big-endian header — with deterministic
  * PCM payloads, so every derived value (byte length, format name,
  * channel count, duration in ms) is a constant the DuckDB oracle can
  * state as ground truth while Spark derives it by actually parsing
  * the headers through `AudioSystem.getAudioFileFormat`.
  *
  * The assembly is programmatic but BYTE-DETERMINISTIC: same sizes,
  * same header fields, same sawtooth payload on every run — the
  * ImageFixtures hex-literal convention without kilobytes of hex.
  *
  * Ids continue the planted-row range (900011+), above ImageFixtures'
  * 900001..900003 and far above any driver-generated doc_id.
  */
object AudioFixtures {

  private def sawtooth(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7) % 256 - 128).toByte)

  /** Canonical RIFF/WAVE: "RIFF" + size + "WAVE" + PCM "fmt " chunk +
    * "data" chunk. 16-bit little-endian (bits = 16) or 8-bit unsigned
    * (bits = 8 — the WAV spec's 8-bit convention) PCM; payload
    * defaults to the deterministic sawtooth.
    */
  private[multimodal] def wav(channels: Int, sampleRate: Int, frames: Int,
                              bits: Int = 16,
                              payload: Option[Array[Byte]] = None): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = frames * blockAlign
    val data = payload.getOrElse(sawtooth(dataSize))
    require(data.length == dataSize,
      s"payload ${data.length} != frames*blockAlign $dataSize")
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
      .put(data)
    bb.array()
  }

  /** Sun AU: ".snd" magic + 24-byte big-endian header. Encoding 3 =
    * 16-bit linear PCM (big-endian payload, the default) or 2 =
    * 8-bit SIGNED linear PCM (AU's 8-bit convention — the opposite
    * sign convention from WAV's 8-bit unsigned, which is why the
    * decoder has a distinct branch for it); payload defaults to the
    * deterministic sawtooth.
    */
  private[multimodal] def au(channels: Int, sampleRate: Int, frames: Int,
                             payload: Option[Array[Byte]] = None,
                             encoding: Int = 3): Array[Byte] = {
    require(encoding == 2 || encoding == 3, s"unsupported AU encoding $encoding")
    val bps = if (encoding == 2) 1 else 2
    val dataSize = frames * channels * bps
    val data = payload.getOrElse(sawtooth(dataSize))
    require(data.length == dataSize,
      s"payload ${data.length} != frames*channels*bps $dataSize")
    val bos = new ByteArrayOutputStream(24 + dataSize)
    val bb = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0x2e736e64) // ".snd"
      .putInt(24) // data offset
      .putInt(dataSize)
      .putInt(encoding)
      .putInt(sampleRate)
      .putInt(channels)
    bos.write(bb.array())
    bos.write(data)
    bos.toByteArray
  }

  /** (mediaId, blob, expected format, expected channels, expected
    * durationMs, expected byteLen). Durations chosen so
    * frames·1000/rate is EXACT — no rounding ambiguity between the
    * codec-derived value and the oracle literal.
    *
    *  - 900011: mono 8 kHz WAV, 4000 frames → 500 ms, 44+8000 bytes
    *  - 900012: stereo 44.1 kHz WAV, 22050 frames → 500 ms, 44+88200
    *  - 900013: mono 8 kHz AU, 16000 frames → 2000 ms, 24+32000
    */
  val expected: Seq[(Long, Array[Byte], String, Int, Long, Long)] = Seq(
    (900011L, wav(1, 8000, 4000), "wav", 1, 500L, 8044L),
    (900012L, wav(2, 44100, 22050), "wav", 2, 500L, 88244L),
    (900013L, au(1, 8000, 16000), "au", 1, 2000L, 32024L))

  def records: Seq[Multimodal.MediaRecord] =
    expected.map { case (id, bytes, _, _, _, _) =>
      Multimodal.MediaRecord(id, "audio", bytes)
    }

  // ---- sample-decode fixtures (r13: the REAL PCM decode path, ----
  // ---- [[Multimodal.MediaCodec.audioSamples]])                 ----

  /** 4000 frames of designed waveforms whose per-channel stats are
    * closed-form:
    *
    *  - 900014: 8-bit UNSIGNED mono WAV, every sample 0xFF (full-scale
    *    positive): peak = rms = 127/128, clip_rate = 1.
    *  - 900015: 16-bit stereo WAV, ch0 digital silence, ch1 a ±16384
    *    square wave: ch0 all-zero; ch1 peak = rms = 0.5, clip 0.
    *  - 900016: 16-bit mono AU (BIG-endian payload), ±16384 square:
    *    peak = rms = 0.5 — an endianness guard: the same bytes misread
    *    little-endian decode to ±64 (rms ≈ 0.002), so a byte-order bug
    *    cannot hash-match.
    */
  private val sampleFrameCount = 4000

  private def const255(n: Int): Array[Byte] = Array.fill(n)(0xff.toByte)

  /** Stereo 16-bit LE frames: ch0 = 0x0000, ch1 alternating ±16384
    * (+16384 LE = 00 40; -16384 LE = 00 C0). */
  private def silenceAndSquareLE(frames: Int): Array[Byte] = {
    val out = new Array[Byte](frames * 4)
    var f = 0
    while (f < frames) {
      out(f * 4 + 2) = 0x00
      out(f * 4 + 3) = (if (f % 2 == 0) 0x40 else 0xc0).toByte
      f += 1
    }
    out
  }

  /** Mono 16-bit BE frames: alternating ±16384 (+16384 BE = 40 00;
    * -16384 BE = C0 00). */
  private def squareBE(frames: Int): Array[Byte] = {
    val out = new Array[Byte](frames * 2)
    var f = 0
    while (f < frames) {
      out(f * 2) = (if (f % 2 == 0) 0x40 else 0xc0).toByte
      f += 1
    }
    out
  }

  /** The sample-decode corpus: the three header fixtures above (their
    * sawtooth stats are deterministic — integer sums of squares stay
    * exact in doubles, so the micros ground truth is closed) plus the
    * three designed waveforms. (media_id, channel, n_frames,
    * peak_micros, rms_micros, clip_micros) — micros = round(x·1e6)
    * HALF_UP, the cross-engine-stable fixed-point convention.
    */
  val sampleExpected: Seq[(Long, Int, Long, Long, Long, Long)] = Seq(
    (900011L, 0, 4000L, 995850L, 575971L, 0L),
    (900012L, 0, 22050L, 995850L, 576266L, 0L),
    (900012L, 1, 22050L, 988464L, 576148L, 0L),
    (900013L, 0, 16000L, 995880L, 576229L, 0L),
    (900014L, 0, 4000L, 992188L, 992188L, 1000000L), // 127/128·1e6 = 992187.5 → HALF_UP
    (900015L, 0, 4000L, 0L, 0L, 0L),
    (900015L, 1, 4000L, 500000L, 500000L, 0L),
    (900016L, 0, 4000L, 500000L, 500000L, 0L))

  def sampleRecords: Seq[Multimodal.MediaRecord] =
    records ++ Seq(
      Multimodal.MediaRecord(900014L, "audio",
        wav(1, 8000, sampleFrameCount, bits = 8,
          payload = Some(const255(sampleFrameCount)))),
      Multimodal.MediaRecord(900015L, "audio",
        wav(2, 8000, sampleFrameCount,
          payload = Some(silenceAndSquareLE(sampleFrameCount)))),
      Multimodal.MediaRecord(900016L, "audio",
        au(1, 8000, sampleFrameCount,
          payload = Some(squareBE(sampleFrameCount)))))
}
