package graft.table

import graft.cells.{BinnedTime, XZ2, XZ3}
import graft.functions.StFunctions
import graft.geom.GeomOps
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Snapshot layout for NON-POINT geometries — the reference's XZ2/XZ3
 * feature indices for line/polygon default geometries
 * (geomesa-index-api/.../index/z2/XZ2Index.scala, z3/XZ3Index.scala;
 * exercised end-to-end by ZLineTest over a LineString type). The
 * point-oriented SpatialTable keys rows by the packed centroid cell;
 * extended geometries instead key by the XZ sequence code of their
 * envelope, which never splits a geometry across rows (one row per
 * feature, exactly like the reference's XZ "one key per feature"
 * design — no dedup pass needed downstream).
 *
 * Layout:
 *   <root>/data/snapshot=<id>/[time_bin=<b>/]part-*.parquet
 *     rows sorted by `xz` inside each file
 *   <root>/_manifests/<id>.json + .committed
 *
 * A bbox(+interval) read = time_bin directory pruning (temporal layout,
 * coarsest) -> xz BETWEEN ranges on the sorted column (Parquet row-group
 * skipping) -> inclusive envelope re-check on the stored extent columns
 * (pure codegen) -> exact JTS st_intersects refine. At 10^12 rows the
 * scan touches only the pruned bins' row groups; nothing shuffles.
 */
object GeomTable {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isCommitted(spark: SparkSession, root: String, snapshotId: String): Boolean =
    fs(spark, root).exists(new Path(s"$root/_manifests/$snapshotId.committed"))

  /** Envelope of a WKB geometry as (minx, miny, maxx, maxy) — parsed
    * ONCE per row at ingest; the stored extent columns serve every
    * later envelope re-check without reparsing. */
  private val envUdf = udf { (wkb: Array[Byte]) =>
    val g = GeomOps.fromWkb(wkb)
    if (g == null || g.isEmpty) null
    else {
      val e = g.getEnvelopeInternal
      (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
    }
  }

  /**
   * Write a snapshot of `df` keyed by the XZ code of each geometry's
   * envelope. `geomCol` is WKB. With `dtgCol` the layout is temporal:
   * time_bin partition directories + XZ3 codes (per-bin, the instant's
   * offset on the time axis); without, a flat XZ2 layout. Rows whose
   * geometry is null/empty (or dtg null on a temporal layout) are not
   * indexable and are dropped, like the reference's write-time
   * validation. Idempotent per (root, snapshotId).
   */
  def write(spark: SparkSession, df: DataFrame, root: String, snapshotId: String,
            geomCol: String = "geom", dtgCol: Option[String] = None,
            res: Int = 12, period: String = "week", partitions: Int = 8): Unit = {
    if (isCommitted(spark, root, snapshotId)) return
    val p = BinnedTime.period(period)
    val withEnv = df
      .withColumn("_env", envUdf(col(geomCol)))
      .where(col("_env").isNotNull)
      .withColumn("minx", col("_env._1")).withColumn("miny", col("_env._2"))
      .withColumn("maxx", col("_env._3")).withColumn("maxy", col("_env._4"))
      .drop("_env")
    val keyed = dtgCol match {
      case Some(dtg) =>
        val xz3 = XZ3(res, p)
        val xzUdf = udf { (minx: Double, miny: Double, maxx: Double, maxy: Double, millis: Long) =>
          val b = BinnedTime.toBinned(p, millis)
          (b.bin.toInt, xz3.index(minx, miny, b.offset, maxx, maxy, b.offset))
        }
        withEnv
          .where(col(dtg).isNotNull)
          .withColumn("_k", xzUdf(col("minx"), col("miny"), col("maxx"), col("maxy"),
            unix_millis(col(dtg).cast("timestamp"))))
          .withColumn("time_bin", col("_k._1")).withColumn("xz", col("_k._2"))
          .drop("_k")
          .repartition(partitions, col("time_bin"))
          .sortWithinPartitions("time_bin", "xz")
      case None =>
        val xz2 = XZ2(res)
        val xzUdf = udf { (minx: Double, miny: Double, maxx: Double, maxy: Double) =>
          xz2.index(minx, miny, maxx, maxy)
        }
        withEnv
          .withColumn("xz", xzUdf(col("minx"), col("miny"), col("maxx"), col("maxy")))
          .repartition(partitions)
          .sortWithinPartitions("xz")
    }
    val writer = keyed.write.mode("overwrite")
    (dtgCol match {
      case Some(_) => writer.partitionBy("time_bin")
      case None => writer
    }).parquet(s"$root/data/snapshot=$snapshotId")

    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/_manifests"))
    val manifest =
      s"""{"res":$res,"period":"$period","geom":"$geomCol","dtg":${dtgCol.map(d => s""""$d"""").getOrElse("null")}}"""
    val out = f.create(new Path(s"$root/_manifests/$snapshotId.json"), true)
    out.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
    f.create(new Path(s"$root/_manifests/$snapshotId.committed"), true).close()
  }

  def read(spark: SparkSession, root: String, snapshotId: String): DataFrame =
    spark.read.parquet(s"$root/data/snapshot=$snapshotId")

  final case class Manifest(res: Int, period: String, dtg: Option[String],
                            geom: String = "geom")

  /** The layout parameters the snapshot was WRITTEN with. Queries must
    * plan against these — XZ codes built at a different res (or time
    * bins at a different period) have a different key base, and a
    * mismatched BETWEEN silently filters out every row. */
  def manifest(spark: SparkSession, root: String, snapshotId: String): Manifest = {
    val path = new Path(s"$root/_manifests/$snapshotId.json")
    val f = fs(spark, root)
    require(f.exists(path), s"no manifest for snapshot $snapshotId under $root")
    val in = f.open(path)
    val text = try {
      new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val res = """"res"\s*:\s*(\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toInt).getOrElse(12)
    val period = """"period"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse("week")
    val dtg = """"dtg"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text).map(_.group(1))
    val geom = """"geom"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse("geom")
    Manifest(res, period, dtg, geom)
  }

  private def boxWkb(minx: Double, miny: Double, maxx: Double, maxy: Double): Array[Byte] = {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    GeomOps.toWkb(gf.toGeometry(new org.locationtech.jts.geom.Envelope(minx, maxx, miny, maxy)))
  }

  private def xzPred(ranges: Seq[graft.cells.IndexRange]): Column =
    ranges.map(r => col("xz").between(lit(r.lower), lit(r.upper))).reduce(_ || _)

  /** bbox scan over a flat XZ2 layout: ranges + envelope + exact refine.
    * The XZ resolution comes from the snapshot's own manifest, never
    * from the caller (a mismatched res would return silent empties). */
  def readBBox(spark: SparkSession, root: String, snapshotId: String,
               minx: Double, miny: Double, maxx: Double, maxy: Double,
               maxRanges: Int = 64): DataFrame = {
    val m = manifest(spark, root, snapshotId)
    val res = m.res
    val geomCol = m.geom
    val ranges = XZ2(res).ranges(minx, miny, maxx, maxy, maxRanges)
    read(spark, root, snapshotId)
      .where(xzPred(ranges))
      .where(col("minx") <= maxx && col("maxx") >= minx &&
        col("miny") <= maxy && col("maxy") >= miny)
      .where(StFunctions.fn("st_intersects")(col(geomCol), lit(boxWkb(minx, miny, maxx, maxy))))
  }

  /**
   * bbox + interval scan over a temporal layout. Interval is
   * [startMillis, endMillis). Per covered bin the XZ3 time axis is the
   * bin-clipped offset window, exactly the reference's per-bin key
   * space (XZ3IndexKeySpace); the dtg re-check runs in the same scan.
   */
  def readBBoxTime(spark: SparkSession, root: String, snapshotId: String,
                   minx: Double, miny: Double, maxx: Double, maxy: Double,
                   startMillis: Long, endMillis: Long,
                   maxRanges: Int = 64): DataFrame = {
    require(endMillis > startMillis, s"empty interval: $startMillis..$endMillis")
    val m = manifest(spark, root, snapshotId)
    require(m.dtg.isDefined, s"snapshot $snapshotId was written without a dtg column")
    val dtgCol = m.dtg.get
    val geomCol = m.geom
    val p = BinnedTime.period(m.period)
    val sfc = XZ3(m.res, p)
    val b0 = BinnedTime.toBinned(p, startMillis)
    val b1 = BinnedTime.toBinned(p, endMillis - 1)
    val binPred = (b0.bin.toInt to b1.bin.toInt).map { bin =>
      val lo = if (bin == b0.bin.toInt) b0.offset else 0L
      val hi = if (bin == b1.bin.toInt) b1.offset else BinnedTime.maxOffset(p) - 1
      col("time_bin") === bin && xzPred(sfc.ranges(minx, miny, lo, maxx, maxy, hi, maxRanges))
    }.reduce(_ || _)
    read(spark, root, snapshotId)
      .where(binPred)
      .where(col("minx") <= maxx && col("maxx") >= minx &&
        col("miny") <= maxy && col("maxy") >= miny)
      .where(unix_millis(col(dtgCol).cast("timestamp")).between(startMillis, endMillis - 1))
      .where(StFunctions.fn("st_intersects")(col(geomCol), lit(boxWkb(minx, miny, maxx, maxy))))
  }

  /** QueryProcess-style CQL over the snapshot: the geometry property
    * resolves to the stored WKB column (every st_* predicate evaluates
    * WKB directly). Pruning comes from the readBBox/readBBoxTime entry
    * points; this is the exact-semantics surface. */
  def queryCql(spark: SparkSession, root: String, snapshotId: String, cql: String,
               geomCol: String = "geom", idColumn: String = "id"): DataFrame =
    graft.plans.Cql.filter(read(spark, root, snapshotId), cql,
      Map("geom" -> col(geomCol)), idColumn)
}
