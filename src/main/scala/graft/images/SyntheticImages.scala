package graft.images

import java.awt.image.BufferedImage
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.geom.GeomOps

/** One row of the engine's primary input table — the exact schema from
  * BASELINE.json `input_hint`:
  * (image_id:string, bytes:binary, w:int, h:int, fmt:string,
  *  caption:string, phash:long). */
final case class ImageRow(
  image_id: String,
  bytes: Array[Byte],
  w: Int,
  h: Int,
  fmt: String,
  caption: String,
  phash: Long)

/**
 * Deterministic synthetic generator for the image+caption input table
 * (FIXTURES.md §1). Fully executor-side: `table(spark, n)` is a
 * `spark.range(n)` mapped per-partition, so generation scales linearly
 * with cores and never collects to the driver — the same code path
 * synthesizes 1e4 rows for tests and 1e7+ rows for the bench.
 *
 * Every attribute derives from the row id through splitmix64, so any
 * slice of the table is reproducible independently (checkpoint-resume
 * safe, SURVEY.md §7.4.8).
 */
object SyntheticImages {

  /** splitmix64 — public-domain seeded mixer; deterministic per id. */
  def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val sizes = Array(64, 128, 256)

  def imageId(id: Long): String = f"img$id%09d"
  def width(id: Long): Int = sizes((mix(id * 3 + 1) & 0x7fffffff).toInt % 3)
  def height(id: Long): Int = sizes((mix(id * 3 + 2) & 0x7fffffff).toInt % 3)
  def fmt(id: Long): String = if ((mix(id * 3 + 3) & 1) == 0) "png" else "jpg"
  def caption(id: Long): String = {
    val subjects = Array("a harbor", "a forest", "a city block", "a mountain ridge",
      "farmland", "a river delta", "a desert plain", "an island chain")
    val mods = Array("at dawn", "under clouds", "in winter", "at high noon",
      "after rain", "in late summer")
    val s = subjects((mix(id + 101) & 0x7fffffff).toInt % subjects.length)
    val m = mods((mix(id + 202) & 0x7fffffff).toInt % mods.length)
    s"satellite view of $s $m (${imageId(id)})"
  }

  /** Deterministic geo-tag: footprint center from the id hash. Latitudes
    * are kept in [-60, 60] and clustered (power-law-ish) to model real
    * imagery skew — hot cells exist by construction so the skew handling
    * (salting/AQE) is actually exercised. */
  def centerLonLat(id: Long): (Double, Double) = {
    val h1 = mix(id + 77)
    val h2 = mix(id + 88)
    // 20% of ids land in one of 8 "city" hotspots; the rest uniform
    if ((h1 & 0xff) < 51) {
      val cities = Array((-74.0, 40.7), (2.35, 48.85), (139.7, 35.7), (-118.2, 34.05),
        (77.2, 28.6), (-43.2, -22.9), (151.2, -33.9), (31.2, 30.0))
      val (cx, cy) = cities((h2 & 0x7fffffff).toInt % cities.length)
      val jx = ((mix(id + 991) & 0xffff) / 65536.0 - 0.5) * 0.5
      val jy = ((mix(id + 992) & 0xffff) / 65536.0 - 0.5) * 0.5
      (cx + jx, cy + jy)
    } else {
      val lon = ((h1 >>> 12) & 0xfffff) / 1048576.0 * 360.0 - 180.0
      val lat = ((h2 >>> 12) & 0xfffff) / 1048576.0 * 120.0 - 60.0
      (lon, lat)
    }
  }

  /** Ground resolution: degrees per pixel (fixed). A 256px image spans
    * ~0.0256 deg (~2.8 km) — between cell res 12 and 14. */
  val DegPerPixel = 1e-4

  /** Per-image footprint polygon (axis-aligned box around the center). */
  def footprint(id: Long): org.locationtech.jts.geom.Geometry = {
    val (cx, cy) = centerLonLat(id)
    val dx = width(id) * DegPerPixel / 2
    val dy = height(id) * DegPerPixel / 2
    GeomOps.bbox(cx - dx, cy - dy, cx + dx, cy + dy)
  }

  def footprintWkb(id: Long): Array[Byte] = GeomOps.toWkb(footprint(id))

  /** Render the deterministic test pattern: smooth two-axis gradient with
    * id-seeded phase (smooth => JPEG survives at PSNR >= 40 dB). */
  def render(id: Long): BufferedImage = {
    val w = width(id); val h = height(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // sinusoidal low-frequency pattern with id-seeded phases: smooth
    // (no sawtooth wrap), so JPEG at q=0.92 stays above the 40 dB bar
    val p1 = (mix(id + 11) & 0xffff) / 65536.0 * 2 * math.Pi
    val p2 = (mix(id + 22) & 0xffff) / 65536.0 * 2 * math.Pi
    val p3 = (mix(id + 33) & 0xffff) / 65536.0 * 2 * math.Pi
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (127.5 * (1 + math.sin(2 * math.Pi * x / w + p1))).toInt
        val g = (127.5 * (1 + math.sin(2 * math.Pi * y / h + p2))).toInt
        val b = (127.5 * (1 + math.sin(math.Pi * (x + y) / (w + h) + p3))).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  def row(id: Long): ImageRow = {
    val img = render(id)
    val f = fmt(id)
    val bytes = if (f == "png") ImageCodec.encodePng(img) else ImageCodec.encodeJpeg(img)
    ImageRow(imageId(id), bytes, width(id), height(id), f, caption(id), ImageCodec.averageHash(img))
  }

  /** Distributed generation of the input table (typed Dataset). */
  def table(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(id => row(id.longValue)))
  }

  /** Input table + derived spatial columns (footprint WKB, centroid
    * lon/lat) — the geo-tagged view every spatial operator consumes. */
  def geoTable(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val idOf = udf((s: String) => s.drop(3).toLong)
    val fp = udf((id: Long) => footprintWkb(id))
    val lon = udf((id: Long) => centerLonLat(id)._1)
    val lat = udf((id: Long) => centerLonLat(id)._2)
    table(spark, n, partitions)
      .withColumn("_id", idOf(col("image_id")))
      .withColumn("footprint", fp(col("_id")))
      .withColumn("lon", lon(col("_id")))
      .withColumn("lat", lat(col("_id")))
      .drop("_id")
  }
}
