package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Raster-chunk mosaicking — the reference's RasterUtils mosaic kernel
 * (geomesa-accumulo-raster/.../util/RasterUtils.scala:101-190:
 * cropRaster / writeToMosaic / mosaicChunks / scaleBufferedImage)
 * re-expressed over a plain pixel-array grid instead of AWT images, so
 * every step is deterministic and runs identically on executors.
 *
 * The viewport form ({@link Mosaic#mosaicChunks}) is a bounded
 * driver-side kernel exactly like the reference's (the output is ONE
 * W x H image for a map window; the input is the handful of chunks a
 * pruned raster query returned). The scale path is
 * {@link Mosaic#mosaicPerTile}: assign every chunk to the fixed output
 * tiles it overlaps (pure-codegen floor arithmetic + explode, the same
 * shape as TileAssign), then build each tile's mosaic inside its group
 * — at 10^12 chunks this is one shuffle keyed by tile id, each task
 * rendering its own tiles, no driver materialization.
 */
object Mosaic {

  /** A row-major single-band pixel grid anchored to a geographic box. */
  final case class Grid(w: Int, h: Int, pixels: Array[Int]) {
    require(pixels.length == w * h, s"grid $w x $h != ${pixels.length} pixels")
    def apply(x: Int, y: Int): Int = pixels(y * w + x)
  }

  final case class Chunk(minX: Double, minY: Double, maxX: Double, maxY: Double, grid: Grid)

  def solid(w: Int, h: Int, value: Int): Grid = Grid(w, h, Array.fill(w * h)(value))

  /**
   * Crop a chunk to the intersection with `env` — RasterUtils
   * .cropRaster:162-189 byte-for-byte: identical-envelope fast path,
   * round() >= 1-pixel area gate, floor() upper-left origin, ceil()
   * extent clamped to the chunk.
   */
  def crop(c: Chunk, minX: Double, minY: Double, maxX: Double, maxY: Double): Option[Grid] = {
    val ixMin = math.max(c.minX, minX); val ixMax = math.min(c.maxX, maxX)
    val iyMin = math.max(c.minY, minY); val iyMax = math.min(c.maxY, maxY)
    if (ixMin > ixMax || iyMin > iyMax) return None
    if (ixMin == c.minX && ixMax == c.maxX && iyMin == c.minY && iyMax == c.maxY) return Some(c.grid)
    val xRes = (c.maxX - c.minX) / c.grid.w
    val yRes = (c.maxY - c.minY) / c.grid.h
    val widthPixels = math.round((ixMax - ixMin) / xRes)
    val heightPixels = math.round((iyMax - iyMin) / yRes)
    if (widthPixels <= 0 || heightPixels <= 0) None
    else {
      val uLX = math.max(math.floor((ixMin - c.minX) / xRes).toInt, 0)
      val uLY = math.max(math.floor((c.maxY - iyMax) / yRes).toInt, 0)
      val tempWidth = math.max(math.ceil((ixMax - ixMin) / xRes).toInt, 0)
      val finalWidth = if (tempWidth + uLX > c.grid.w) c.grid.w - uLX else tempWidth
      val tempHeight = math.max(math.ceil((iyMax - iyMin) / yRes).toInt, 0)
      val finalHeight = if (tempHeight + uLY > c.grid.h) c.grid.h - uLY else tempHeight
      val out = new Array[Int](finalWidth * finalHeight)
      var y = 0
      while (y < finalHeight) {
        System.arraycopy(c.grid.pixels, (uLY + y) * c.grid.w + uLX, out, y * finalWidth, finalWidth)
        y += 1
      }
      Some(Grid(finalWidth, finalHeight, out))
    }
  }

  /** Nearest-neighbor resample — scaleBufferedImage:146-160 with the
    * AWT drawImage NEAREST_NEIGHBOR hint replaced by the explicit
    * dst-pixel -> src-pixel floor map (identical on solid regions). */
  def scale(g: Grid, newW: Int, newH: Int): Grid = {
    if (g.w == newW && g.h == newH) g
    else {
      require(newW >= 1 && newH >= 1, s"cannot scale to $newW x $newH")
      val out = new Array[Int](newW * newH)
      var y = 0
      while (y < newH) {
        val sy = math.min(g.h - 1, y * g.h / newH)
        var x = 0
        while (x < newW) {
          out(y * newW + x) = g(math.min(g.w - 1, x * g.w / newW), sy)
          x += 1
        }
        y += 1
      }
      Grid(newW, newH, out)
    }
  }

  /** Paste a chunk's crop into the mosaic at the floor()-snapped pixel
    * origin — writeToMosaic:101-110. */
  private def paste(mosaic: Array[Int], mw: Int, mh: Int, c: Chunk,
                    minX: Double, minY: Double, maxX: Double, maxY: Double,
                    resX: Double, resY: Double): Unit = {
    crop(c, minX, minY, maxX, maxY).foreach { cropped =>
      val ixMin = math.max(c.minX, minX); val ixMax = math.min(c.maxX, maxX)
      val iyMax = math.min(c.maxY, maxY)
      val originX = math.floor((ixMin - minX) / resX).toInt
      val originY = math.floor((maxY - iyMax) / resY).toInt
      val w = math.min(cropped.w, mw - originX)
      val h = math.min(cropped.h, mh - originY)
      var y = 0
      while (y < h) {
        System.arraycopy(cropped.pixels, y * cropped.w, mosaic, (originY + y) * mw + originX, w)
        y += 1
      }
    }
  }

  /**
   * Stitch chunks over a query envelope into one queryW x queryH grid —
   * mosaicChunks:112-144: single-chunk fast path (crop + scale); else a
   * native-resolution canvas sized by the FIRST chunk's pixel density,
   * every chunk pasted, then one nearest-neighbor resample. Returns the
   * grid and the number of chunks consumed.
   */
  def mosaicChunks(chunks: Iterator[Chunk], queryW: Int, queryH: Int,
                   minX: Double, minY: Double, maxX: Double, maxY: Double): (Option[Grid], Int) = {
    if (!chunks.hasNext) (None, 0)
    else {
      val first = chunks.next()
      if (!chunks.hasNext) {
        (crop(first, minX, minY, maxX, maxY).map(scale(_, queryW, queryH)), 1)
      } else {
        val resX = (first.maxX - first.minX) / first.grid.w
        val resY = (first.maxY - first.minY) / first.grid.h
        val mw = math.round((maxX - minX) / resX).toInt
        val mh = math.round((maxY - minY) / resY).toInt
        if (mw <= 0 || mh <= 0) (None, 1)
        else {
          var count = 1
          val canvas = new Array[Int](mw * mh)
          paste(canvas, mw, mh, first, minX, minY, maxX, maxY, resX, resY)
          while (chunks.hasNext) {
            paste(canvas, mw, mh, chunks.next(), minX, minY, maxX, maxY, resX, resY)
            count += 1
          }
          (Some(scale(Grid(mw, mh, canvas), queryW, queryH)), count)
        }
      }
    }
  }

  /**
   * Render chunks onto a FIXED-extent canvas: each chunk is cropped to
   * the canvas envelope, nearest-neighbor resampled to its pixel window
   * at the canvas resolution, and pasted. Unlike the viewport kernel
   * above (which sizes its working canvas from the first chunk and
   * stretches a lone partial chunk across the whole output — the
   * reference's single-chunk fast path), a tile keeps its geography:
   * uncovered canvas stays 0.
   */
  def renderTile(chunks: Iterator[Chunk], tileW: Int, tileH: Int,
                 minX: Double, minY: Double, maxX: Double, maxY: Double): Option[(Grid, Int)] = {
    val resX = (maxX - minX) / tileW
    val resY = (maxY - minY) / tileH
    val canvas = new Array[Int](tileW * tileH)
    var count = 0
    while (chunks.hasNext) {
      val c = chunks.next()
      crop(c, minX, minY, maxX, maxY).foreach { cropped =>
        val ixMin = math.max(c.minX, minX); val ixMax = math.min(c.maxX, maxX)
        val iyMin = math.max(c.minY, minY); val iyMax = math.min(c.maxY, maxY)
        val originX = math.floor((ixMin - minX) / resX).toInt
        val originY = math.floor((maxY - iyMax) / resY).toInt
        val winW = math.min(math.max(math.round((ixMax - ixMin) / resX).toInt, 1), tileW - originX)
        val winH = math.min(math.max(math.round((iyMax - iyMin) / resY).toInt, 1), tileH - originY)
        if (winW > 0 && winH > 0) {
          val scaled = scale(cropped, winW, winH)
          var y = 0
          while (y < winH) {
            System.arraycopy(scaled.pixels, y * winW, canvas, (originY + y) * tileW + originX, winW)
            y += 1
          }
          count += 1
        }
      }
    }
    if (count == 0) None else Some((Grid(tileW, tileH, canvas), count))
  }

  /**
   * Distributed raster -> tile rendering: every chunk is exploded to the
   * fixed `tileDeg`-degree output tiles it overlaps (pure-codegen floor
   * arithmetic — no UDF before the shuffle), shuffled ONCE on
   * (tile_x, tile_y), and each group renders its tile with
   * {@link Mosaic#renderTile}. Input columns: minx/miny/maxx/maxy, w, h,
   * and `pixels` (array<int>, row-major). Output: one row per non-empty
   * tile with the rendered tileW x tileH pixels.
   *
   * Scale shape: the only shuffle carries (tile id, chunk payload) pairs
   * for chunks that overlap that tile; tiles render independently in
   * their tasks. Skewed tiles (many chunks) split via AQE like any
   * aggregation key.
   */
  def mosaicPerTile(chunks: DataFrame, tileDeg: Double, tileW: Int, tileH: Int): DataFrame = {
    val s = chunks.sparkSession
    import s.implicits._
    val tx = (c: Column) => floor(c / tileDeg).cast("int")
    val exploded = chunks
      .withColumn("tile_x", explode(sequence(tx(col("minx")),
        greatest(tx(col("maxx") - lit(1e-12)), tx(col("minx"))))))
      .withColumn("tile_y", explode(sequence(tx(col("miny")),
        greatest(tx(col("maxy") - lit(1e-12)), tx(col("miny"))))))
    exploded
      .select($"tile_x", $"tile_y", $"minx", $"miny", $"maxx", $"maxy", $"w", $"h", $"pixels")
      .as[(Int, Int, Double, Double, Double, Double, Int, Int, Array[Int])]
      .groupByKey { case (txv, tyv, _, _, _, _, _, _, _) => (txv, tyv) }
      .flatMapGroups { (key: (Int, Int), rows: Iterator[(Int, Int, Double, Double, Double, Double, Int, Int, Array[Int])]) =>
        val (txv, tyv) = key
        val x0 = txv * tileDeg; val y0 = tyv * tileDeg
        val cs = rows.map { case (_, _, nx, ny, mx, my, w, h, px) =>
          Chunk(nx, ny, mx, my, Grid(w, h, px))
        }
        renderTile(cs, tileW, tileH, x0, y0, x0 + tileDeg, y0 + tileDeg) match {
          case Some((g, n)) => Iterator.single((txv, tyv, n, g.pixels))
          case None => Iterator.empty
        }
      }
      .toDF("tile_x", "tile_y", "chunk_count", "pixels")
  }
}
