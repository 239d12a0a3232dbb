package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/**
 * Image encode/decode + metrics over the in-JDK codecs (javax.imageio —
 * no external native libs in this container, SURVEY.md §7.1.3). All
 * methods are static and allocation-conscious: they run per-row inside
 * executor tasks (mapPartitions / UDFs), so no driver-side state.
 */
object ImageCodec {

  /** Decode to packed RGB ints (no alpha), row-major. */
  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    img
  }

  def rgb(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def encodeJpeg(img: BufferedImage, quality: Float = 0.92f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    // JPEG needs 3-band RGB (no alpha)
    val rgbImg = if (img.getType == BufferedImage.TYPE_INT_RGB) img else {
      val copy = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      val gfx = copy.createGraphics()
      gfx.drawImage(img, 0, 0, null)
      gfx.dispose()
      copy
    }
    writer.write(null, new IIOImage(rgbImg, null, null), params)
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Peak signal-to-noise ratio in dB between two same-size RGB images.
    * Infinity for identical pixels. The per-row decode-parity invariant is
    * PSNR >= 40 dB for lossy formats (BASELINE.json input_hint). */
  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, "size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val pa = a(i); val pb = b(i)
      val dr = ((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)
      val dg = ((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)
      val db = (pa & 0xff) - (pb & 0xff)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (a.length * 3.0)
    if (mse == 0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /**
   * 64-bit average-hash perceptual fingerprint: downsample to 8x8
   * grayscale by box averaging, threshold at the mean. Robust to lossy
   * re-encoding; used for near-duplicate image detection and as the
   * `phash` column of the input table.
   */
  def averageHash(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val px = rgb(img)
    val cellW = math.max(1, w / 8); val cellH = math.max(1, h / 8)
    val gray = new Array[Double](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        var sum = 0.0; var n = 0
        var y = gy * cellH
        val yEnd = math.min(h, (gy + 1) * cellH)
        while (y < yEnd) {
          var x = gx * cellW
          val xEnd = math.min(w, (gx + 1) * cellW)
          while (x < xEnd) {
            val p = px(y * w + x)
            sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        gray(gy * 8 + gx) = if (n == 0) 0 else sum / n
        gx += 1
      }
      gy += 1
    }
    val mean = gray.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (gray(i) >= mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
