package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.images.ImageCodec

/**
 * Multimodal (binary-payload) column operators for training-data
 * pipelines: images travel as opaque `binary` columns with typed
 * metadata; decode / feature-extraction / resize run per partition so
 * codecs initialize once per task, not per row. Implemented with the
 * in-JDK codecs (javax.imageio) — PNG/JPEG decode, downscale, and
 * pixel-statistics features are REAL here; exotic formats (video frame
 * sampling, audio) would slot into the same mapPartitions shape with
 * their decoders.
 */
object Multimodal {

  final case class ImageFeatures(
    image_id: String,
    width: Int,
    height: Int,
    mean_r: Double, mean_g: Double, mean_b: Double,
    luma_mean: Double, luma_std: Double,
    phash: Long,
    decode_ok: Boolean)

  /** Decode + per-image feature extraction. Undecodable payloads yield
    * decode_ok=false rows instead of failing the job (bad bytes are data
    * at 100 TB, not exceptions). */
  def imageFeatures(spark: SparkSession, df: DataFrame,
                    idCol: String = "image_id", bytesCol: String = "bytes"): Dataset[ImageFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = ImageCodec.decode(bytes)
            val px = ImageCodec.rgb(img)
            var r = 0.0; var g = 0.0; var b = 0.0; var l = 0.0; var l2 = 0.0
            var i = 0
            while (i < px.length) {
              val p = px(i)
              val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
              r += pr; g += pg; b += pb
              val luma = 0.299 * pr + 0.587 * pg + 0.114 * pb
              l += luma; l2 += luma * luma
              i += 1
            }
            val n = px.length.toDouble
            val lm = l / n
            ImageFeatures(id, img.getWidth, img.getHeight, r / n, g / n, b / n,
              lm, math.sqrt(math.max(0, l2 / n - lm * lm)),
              ImageCodec.averageHash(img), decode_ok = true)
          } catch {
            case _: Exception =>
              ImageFeatures(id, -1, -1, 0, 0, 0, 0, 0, 0L, decode_ok = false)
          }
        }
      }
  }

  /** Downscale the binary image column (bounding-box fit, preserves
    * aspect), re-encoded as PNG — the thumbnailing stage of an ingest
    * pipeline. */
  def resize(spark: SparkSession, df: DataFrame, maxDim: Int,
             idCol: String = "image_id", bytesCol: String = "bytes"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val img = ImageCodec.decode(bytes)
            val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
            val out = if (scale >= 1.0) img else {
              val w = math.max(1, (img.getWidth * scale).toInt)
              val h = math.max(1, (img.getHeight * scale).toInt)
              val scaled = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val gfx = scaled.createGraphics()
              gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              gfx.drawImage(img, 0, 0, w, h, null)
              gfx.dispose()
              scaled
            }
            Some((id, ImageCodec.encodePng(out), out.getWidth, out.getHeight))
          } catch { case _: Exception => None }
        }
      }.toDF(idCol, "thumb_bytes", "thumb_w", "thumb_h")
  }

  // ---- audio modality (REAL RIFF/WAVE PCM16 decode, pure JVM) ---------

  final case class AudioFeatures(
    audio_id: String, sample_rate: Int, channels: Int, n_samples: Long,
    duration_s: Double, rms: Double, peak: Double, zero_crossings: Long,
    decode_ok: Boolean)

  /** Decode a WAV binary column and extract per-clip signal features
    * (duration, RMS, peak, zero-crossing count) — the audio analog of
    * imageFeatures, same mapPartitions shape, same bad-bytes-are-data
    * tolerance. Supports RIFF/WAVE PCM16 (the interchange baseline). */
  def audioFeatures(spark: SparkSession, df: DataFrame,
                    idCol: String = "audio_id", bytesCol: String = "bytes"): Dataset[AudioFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            require(buf.getInt(0) == 0x46464952, "not RIFF") // "RIFF" LE
            require(buf.getInt(8) == 0x45564157, "not WAVE") // "WAVE" LE
            // walk chunks for fmt + data
            var pos = 12
            var sampleRate = 0; var channels = 0; var bits = 0
            var dataOff = -1; var dataLen = 0
            while (pos + 8 <= bytes.length && (dataOff < 0 || sampleRate == 0)) {
              val ckId = buf.getInt(pos)
              val ckLen = buf.getInt(pos + 4)
              // corrupt negative/overflowing chunk length would stall the
              // walk (pos advance <= 0) — bad bytes must be data, never a hang
              require(ckLen >= 0, s"bad chunk length $ckLen")
              if (ckId == 0x20746d66) { // "fmt "
                channels = buf.getShort(pos + 10)
                sampleRate = buf.getInt(pos + 12)
                bits = buf.getShort(pos + 22)
              } else if (ckId == 0x61746164) { // "data"
                dataOff = pos + 8; dataLen = ckLen
              }
              pos += 8 + ckLen + (ckLen & 1)
            }
            require(dataOff > 0 && sampleRate > 0 && bits == 16, "unsupported wav")
            val n = dataLen / 2
            var sum2 = 0.0; var peak = 0.0; var zc = 0L
            var prevSign = 0
            var i = 0
            while (i < n) {
              val s = buf.getShort(dataOff + i * 2).toDouble / 32768.0
              sum2 += s * s
              val a = math.abs(s); if (a > peak) peak = a
              val sign = if (s > 0) 1 else if (s < 0) -1 else 0
              if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
              if (sign != 0) prevSign = sign
              i += 1
            }
            val frames = n / math.max(1, channels)
            AudioFeatures(id, sampleRate, channels, frames,
              frames.toDouble / sampleRate, math.sqrt(sum2 / math.max(1, n)), peak, zc,
              decode_ok = true)
          } catch {
            case _: Exception => AudioFeatures(id, -1, -1, -1, 0, 0, 0, 0, decode_ok = false)
          }
        }
      }
  }

  // ---- video modality (STUB decoder, real plumbing) -------------------

  /** Pluggable frame decoder. Real video codecs (H.264 et al.) are NOT
    * on a vanilla JVM classpath, so the default implementation is a
    * clearly-marked deterministic STUB that parses the synthetic GVID
    * container (graft.images.SyntheticMedia.video). The operator's
    * Spark-side plumbing — schema, per-partition decode, stride
    * sampling, timestamp arithmetic — is real and is what the tests
    * exercise; swapping in a JavaCV/FFmpeg-backed decoder changes only
    * this trait's implementation. */
  trait VideoDecoder extends Serializable {
    def meta(bytes: Array[Byte]): (Int, Int, Int, Int) // (w, h, fps, nFrames)
    def framePayload(bytes: Array[Byte], frame: Int): Long // decoded-frame digest (STUB: per-frame seed)
  }

  object StubGvidDecoder extends VideoDecoder {
    override def meta(bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      require(buf.getInt(0) == graft.images.SyntheticMedia.VideoMagic, "not GVID")
      (buf.getInt(4), buf.getInt(8), buf.getInt(12), buf.getInt(16))
    }
    override def framePayload(bytes: Array[Byte], frame: Int): Long =
      java.nio.ByteBuffer.wrap(bytes).getLong(20 + frame * 8)
  }

  final case class FrameSample(
    video_id: String, frame_idx: Int, ts_ms: Long,
    width: Int, height: Int, frame_hash: Long, decode_ok: Boolean)

  /** Sample every `everyN`-th frame of each video binary into one row
    * per sampled frame (the frame-extraction stage of a video-training
    * pipeline). One decoder init per partition; bad payloads yield a
    * single decode_ok=false row. */
  def frameSample(spark: SparkSession, df: DataFrame, everyN: Int,
                  idCol: String = "video_id", bytesCol: String = "bytes",
                  decoder: VideoDecoder = StubGvidDecoder): Dataset[FrameSample] = {
    import spark.implicits._
    require(everyN >= 1)
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val (w, h, fps, nFrames) = decoder.meta(bytes)
            (0 until nFrames by everyN).iterator.map { f =>
              FrameSample(id, f, f.toLong * 1000 / math.max(1, fps), w, h,
                decoder.framePayload(bytes, f), decode_ok = true)
            }
          } catch {
            case _: Exception => Iterator(FrameSample(id, -1, -1, -1, -1, 0L, decode_ok = false))
          }
        }
      }
  }

  /** Near-duplicate image pairs by perceptual hash: SimHash-style
    * pigeonhole blocking over the 64-bit phash (exact for hamming <=
    * maxDist) — dedup for the image modality. */
  /**
   * Image-corpus curation composite — the image analog of
   * [[TextAnalysis.cleanCorpus]]: ONE decode pass derives every signal
   * (imageFeatures), the validity/quality gates run on those features,
   * and exact-phash canonical election dedups near-identical images.
   * Fate per image, exactly one of:
   * `decode_fail | too_small | extreme_aspect | low_variance |
   * phash_dup | kept`.
   *
   * Scale shape mirrors cleanCorpus: the binary payload is dropped at
   * the feature projection — only (id, features) ever enter a shuffle;
   * canonical election is groupBy-min + equi-join (a hot phash — a
   * billion identical thumbnails — collapses map-side), never a window.
   * Near-dup pairs at hamming > 0 stay the separate phashPairs /
   * components path (they need the banding join, not a gate).
   */
  def cleanImages(spark: SparkSession, df: DataFrame,
                  idCol: String = "image_id", bytesCol: String = "bytes",
                  minDim: Int = 64, maxAspect: Double = 4.0,
                  minLumaStd: Double = 2.0): DataFrame = {
    val feat = imageFeatures(spark, df, idCol, bytesCol).toDF()
    val small = least(col("width"), col("height")) < minDim
    val aspect = greatest(col("width"), col("height")).cast("double") /
      least(col("width"), col("height"))
    val pass = col("decode_ok") && !small && aspect <= maxAspect &&
      col("luma_std") >= minLumaStd
    val tagged = feat.withColumn("__pass", coalesce(pass, lit(false)))
    val canon = tagged.where(col("__pass"))
      .groupBy("phash").agg(min(col("image_id")).as("__c"))
    tagged.join(canon, Seq("phash"), "left")
      .withColumn("fate",
        when(!col("decode_ok"), "decode_fail")
          .when(small, "too_small")
          .when(aspect > maxAspect, "extreme_aspect")
          .when(col("luma_std") < minLumaStd, "low_variance")
          .when(col("image_id") =!= col("__c"), "phash_dup")
          .otherwise("kept"))
      .select(col("image_id"), col("width"), col("height"), col("phash"), col("fate"))
  }

  def phashPairs(df: DataFrame, idCol: String, phashCol: String, maxDist: Int = 6,
                 maxBucket: Int = 4096): DataFrame =
    Dedup.hammingPairs(df, idCol, phashCol, maxDist, maxBucket)
}
