package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.StFunctions
import graft.images.SyntheticImages
import graft.operators.{SpatialJoin, TileAssign, Density, BoxOps}
import graft.table.SpatialTable

/**
 * The flagship job (BASELINE.json north_star): a 10^12-scale-designed
 * spatial-join + tiling pipeline over the image+caption table —
 *
 *   input table (image_id, bytes, w, h, fmt, caption, phash)
 *     -> derived footprints (deterministic geo-tag)
 *     -> decode-parity audit on a seeded sample (PSNR >= 40 dB + caption)
 *     -> point-in-polygon join footprints x zones (cell equi-join)
 *     -> tile assignment at res 7-9 (explode cover)
 *     -> density rollup at res 7
 *     -> snapshot write with per-partition lineage metrics (resumable)
 *
 * Every stage is a declarative DataFrame op: scan-side filters push to
 * Parquet, the join is a broadcast/shuffled hash join on cells (never a
 * cartesian), aggregation is map-side partial. Input generation is
 * cached to Parquet so benchmark timings measure the spatial stages,
 * not javax.imageio encoding.
 */
object ImagePipeline {

  final case class Result(nImages: Long, joinRows: Long, tileRows: Long,
                          densityCells: Long, auditedRows: Long, secs: Double,
                          stageSecs: Map[String, Double] = Map.empty) {
    def imagesPerSec: Double = nImages / secs
    def outputRowsPerSec: Double = (joinRows + tileRows) / secs
  }

  /** Deterministic zone table: `n` seeded boxes (0.5-3 deg) concentrated
    * like the image hotspots, so the join has realistic selectivity+skew. */
  def zones(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    StFunctions.register(spark)
    (0 until n).map { i =>
      val (cx, cy) = SyntheticImages.centerLonLat(1000000L + i) // same skewed law
      val half = 0.25 + (SyntheticImages.mix(i.toLong + 555) & 0xff) / 256.0 * 1.25
      (i.toLong, math.max(-180, cx - half), math.max(-89, cy - half),
        math.min(180, cx + half), math.min(89, cy + half))
    }.toDF("zone_id", "x0", "y0", "x1", "y1")
      .selectExpr("zone_id", "st_makeBBOX(x0, y0, x1, y1) AS z_geom")
  }

  /** Generate-once cache of the geo-tagged input table. */
  def ensureInput(spark: SparkSession, n: Long, cacheDir: String): String = {
    val path = s"$cacheDir/graft_images_n$n"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      SyntheticImages.geoTable(spark, n, partitions = 32)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Geo-only input (no image bytes): the scaling benchmark measures the
    * spatial-join + tiling stages, whose input columns are (image_id,
    * footprint, lon, lat) — generating the multi-GB `bytes` column would
    * only benchmark javax.imageio. Same ids, same geo law, so row counts
    * and tile assignments are identical to the full table's. */
  def ensureGeoInput(spark: SparkSession, n: Long, cacheDir: String): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val path = s"$cacheDir/graft_geo_v2_n$n"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      val fp = udf((id: Long) => SyntheticImages.footprintWkb(id))
      val bounds = udf { (id: Long) =>
        val (cx, cy) = SyntheticImages.centerLonLat(id)
        val dx = SyntheticImages.width(id) * SyntheticImages.DegPerPixel / 2
        val dy = SyntheticImages.height(id) * SyntheticImages.DegPerPixel / 2
        (cx, cy, cx - dx, cy - dy, cx + dx, cy + dy)
      }
      val idU = udf((id: Long) => SyntheticImages.imageId(id))
      spark.range(0, n, 1, 64)
        .select(idU(col("id")).as("image_id"), fp(col("id")).as("footprint"),
          bounds(col("id")).as("__b"))
        .select(col("image_id"), col("footprint"),
          col("__b._1").as("lon"), col("__b._2").as("lat"),
          col("__b._3").as("fxmin"), col("__b._4").as("fymin"),
          col("__b._5").as("fxmax"), col("__b._6").as("fymax"))
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Decode-parity audit (per-row invariant, BASELINE.json input_hint):
    * decode bytes, check dims + caption embed + phash reproduction.
    * Runs on a deterministic 1/64 sample — the invariant is per-row, the
    * audit is the sampled enforcement the metrics table records. */
  def audit(spark: SparkSession, inputPath: String): Long = {
    import spark.implicits._
    val df = spark.read.parquet(inputPath)
      .where(pmod(xxhash64(col("image_id")), lit(64)) === 0)
    val bad = df.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
      .as[(String, Array[Byte], Int, Int, String, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h, fmt, caption, phash) =>
          val img = graft.images.ImageCodec.decode(bytes)
          val okDims = img.getWidth == w && img.getHeight == h
          val okCaption = caption.contains(id)
          val rehash = graft.images.ImageCodec.averageHash(img)
          // png: exact hash; jpg: hamming tolerance (lossy, PSNR-bounded)
          val okHash =
            if (fmt == "png") rehash == phash
            else graft.images.ImageCodec.hammingDistance(rehash, phash) <= 6
          (id, okDims && okCaption && okHash)
        }
      }.filter(!_._2).count()
    require(bad == 0, s"$bad rows failed the decode-parity audit")
    df.count()
  }

  /** Zone table with bounds columns (the codegen join path's input). */
  def zoneBoxes(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val (cx, cy) = SyntheticImages.centerLonLat(1000000L + i)
      val half = 0.25 + (SyntheticImages.mix(i.toLong + 555) & 0xff) / 256.0 * 1.25
      (i.toLong, math.max(-180, cx - half), math.max(-89, cy - half),
        math.min(180, cx + half), math.min(89, cy + half))
    }.toDF("zone_id", "zxmin", "zymin", "zxmax", "zymax")
  }

  /** The measured stages: PIP join + fixed-res tiling + density rollup.
    * Runs on the whole-stage-codegen box operators (BoxOps) — the WKB/JTS
    * operators compute identical results (asserted in BoxOpsSpec) but
    * cross the codegen boundary per row. */
  def runJoinTile(spark: SparkSession, inputPath: String, nZones: Int,
                  tileRes: Int = 9, joinRes: Int = 7): Result = {
    StFunctions.register(spark)
    val t0 = System.nanoTime()
    val imgs = spark.read.parquet(inputPath)
      .select("image_id", "fxmin", "fymin", "fxmax", "fymax")
    val z = zoneBoxes(spark, nZones)
    def timed[A](f: => A): (A, Double) = {
      val s0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - s0) / 1e9)
    }
    val (joinRows, tJoin) = timed(BoxOps.intersectsJoin(
      imgs, ("fxmin", "fymin", "fxmax", "fymax"),
      z, ("zxmin", "zymin", "zxmax", "zymax"),
      res = joinRes, broadcastRight = true).count())
    val (tileRows, tTile) = timed(
      BoxOps.tiles(imgs, "fxmin", "fymin", "fxmax", "fymax", tileRes).count())
    val (densityCells, tDen) = timed(
      BoxOps.density(imgs, "fxmin", "fymin", "fxmax", "fymax", 7).count())
    val (n, tCount) = timed(imgs.count())
    val secs = (System.nanoTime() - t0) / 1e9
    Result(n, joinRows, tileRows, densityCells, 0L, secs,
      Map("join" -> tJoin, "tile" -> tTile, "density" -> tDen, "count" -> tCount))
  }

  /** Same stages through the generic WKB/JTS operators (compute-bound
    * variant: per-row geometry parsing + prepared-geometry refinement).
    * Identical outputs (BoxOpsSpec asserts path equality). */
  def runJoinTileWkb(spark: SparkSession, inputPath: String, nZones: Int,
                     tileRes: Int = 9, joinRes: Int = 7): Result = {
    StFunctions.register(spark)
    val t0 = System.nanoTime()
    val imgs = spark.read.parquet(inputPath)
      .select("image_id", "footprint", "lon", "lat")
    val z = zones(spark, nZones)
    val joined = SpatialJoin.intersects(imgs, "footprint", z, "z_geom",
      res = joinRes, broadcastRight = true)
    val joinRows = joined.count()
    val tiles = TileAssign.atRes(imgs, "footprint", tileRes, maxCells = 16)
    val tileRows = tiles.count()
    val density = Density.extents(imgs, "footprint", res = 7, maxCells = 16)
    val densityCells = density.count()
    val n = imgs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    Result(n, joinRows, tileRows, densityCells, 0L, secs)
  }

  /** Full pipeline incl. audit + resumable snapshot write (not part of
    * the throughput-metric stages; lineage lands in the metrics table). */
  def runFull(spark: SparkSession, n: Long, nZones: Int, cacheDir: String,
              outRoot: String, snapshotId: String): Result = {
    val input = ensureInput(spark, n, cacheDir)
    val audited = audit(spark, input)
    val r = runJoinTile(spark, input, nZones)
    val imgs = spark.read.parquet(input).drop("bytes")
    SpatialTable.write(spark, imgs, outRoot, snapshotId, "image_id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 4)
    r.copy(auditedRows = audited)
  }
}
