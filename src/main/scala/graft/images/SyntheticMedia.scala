package graft.images

import java.nio.{ByteBuffer, ByteOrder}
import graft.images.SyntheticImages.mix

/**
 * Deterministic synthetic audio/video payloads for the multimodal
 * operators (the brief's "synthesise deterministically at small scale"
 * rule — no external data, same bytes for the same id on every run).
 *
 * Audio is REAL RIFF/WAVE PCM16: any standard reader decodes it.
 * Video is a self-describing fake container ("GVID": header + per-frame
 * seeds) standing in for codec bitstreams that are not on a vanilla
 * JVM classpath — the container layout is what the frame-sampling
 * plumbing exercises.
 */
object SyntheticMedia {

  /** Mono PCM16 WAV: seeded mixture of a sine (freq derived from id)
    * and low-level noise. */
  def wav(id: Long, sampleRate: Int = 8000, seconds: Double = 0.5): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val freq = 200.0 + (mix(id) & 0x3ff).toDouble // 200..1223 Hz
    val amp = 0.3 + ((mix(id + 1) & 0xff).toDouble / 255.0) * 0.5 // 0.3..0.8
    val data = new Array[Short](n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / sampleRate
      val noise = ((mix(id * 1000003 + i) >>> 40).toDouble / (1L << 24).toDouble - 0.5) * 0.02
      val v = amp * math.sin(2 * math.Pi * freq * t) + noise
      data(i) = (math.max(-1.0, math.min(1.0, v)) * 32767).toShort
      i += 1
    }
    val byteLen = n * 2
    val buf = ByteBuffer.allocate(44 + byteLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + byteLen).put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    buf.put("data".getBytes("ASCII")).putInt(byteLen)
    data.foreach(buf.putShort)
    buf.array()
  }

  val VideoMagic: Int = 0x47564944 // "GVID"

  /** Fake video container: header (magic, w, h, fps, nFrames) + one
    * 8-byte seed per frame. */
  def video(id: Long, w: Int = 64, h: Int = 48, fps: Int = 10, nFrames: Int = 30): Array[Byte] = {
    val buf = ByteBuffer.allocate(20 + nFrames * 8).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(VideoMagic).putInt(w).putInt(h).putInt(fps).putInt(nFrames)
    (0 until nFrames).foreach(f => buf.putLong(mix(id * 100003 + f)))
    buf.array()
  }
}
