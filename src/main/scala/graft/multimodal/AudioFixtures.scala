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

  /** Canonical RIFF/WAVE: "RIFF" + size + "WAVE" + 16-byte PCM "fmt "
    * chunk + "data" chunk. 16-bit little-endian PCM.
    */
  private[multimodal] def wav(channels: Int, sampleRate: Int, frames: Int): Array[Byte] = {
    val bitsPerSample = 16
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = frames * blockAlign
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
      .put(sawtooth(dataSize))
    bb.array()
  }

  /** Sun AU: ".snd" magic + 24-byte big-endian header, encoding 3 =
    * 16-bit linear PCM (big-endian payload).
    */
  private[multimodal] def au(channels: Int, sampleRate: Int, frames: Int): Array[Byte] = {
    val dataSize = frames * channels * 2
    val bos = new ByteArrayOutputStream(24 + dataSize)
    val bb = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0x2e736e64) // ".snd"
      .putInt(24) // data offset
      .putInt(dataSize)
      .putInt(3) // 16-bit linear PCM
      .putInt(sampleRate)
      .putInt(channels)
    bos.write(bb.array())
    bos.write(sawtooth(dataSize))
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
}
