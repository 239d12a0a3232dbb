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

  /** Near-duplicate image pairs by perceptual hash: SimHash-style
    * pigeonhole blocking over the 64-bit phash (exact for hamming <=
    * maxDist) — dedup for the image modality. */
  def phashPairs(df: DataFrame, idCol: String, phashCol: String, maxDist: Int = 6,
                 maxBucket: Int = 4096): DataFrame =
    Dedup.hammingPairs(df, idCol, phashCol, maxDist, maxBucket)
}
