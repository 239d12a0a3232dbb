package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.StFunctions
import graft.geom.GeomOps

/**
 * Track-based joins — Spark-native reformulations of the reference's
 * TubeSelectProcess (spatio-temporal corridor join, geomesa-process/
 * .../tube/TubeBuilder.scala:39-90, TubeSelectProcess.scala:33-182) and
 * RouteSearchProcess (route proximity + heading match,
 * .../query/RouteSearchProcess.scala).
 *
 * Both follow the engine's standard shape: build small "segment" tables
 * from the track/route (window functions), broadcast them, candidate
 * via cell containment, refine with exact geometry/time/heading
 * predicates. The big (feature) side never shuffles beyond its cell key.
 */
object TrackOps {

  /** Segment covers must NEVER coarsen: a coarsened cover's packed
    * resolution can no longer equi-join the features' fixed-res point
    * cells (the silent-pair-loss class SpatialJoin's size split
    * closed). Track/route segment tables are small broadcast sides, so
    * an uncapped-in-practice budget is safe; 2^20 covers the whole
    * world grid up to res 10 (the supported range — require below). */
  private val CoverBudget: Int = 1 << 20
  private def requireRes(res: Int): Unit =
    require(res >= 0 && res <= 10, s"track ops support res 0..10 (got $res): " +
      "the segment cover budget guarantees no coarsening only in that range")


  /** Tube segments from an ordered track: consecutive point pairs with
    * a buffered corridor geometry and a [t0, t1] time window (+/- slack).
    * NoGapFill semantics (the reference's default). */
  def tubeSegments(track: DataFrame, lonCol: String, latCol: String, millisCol: String,
                   bufferMeters: Double, timeSlackMs: Long): DataFrame = {
    val w = Window.orderBy(col(millisCol))
    // a SINGLE-point track still produces a tube — a buffered disk — like
    // the reference (TubeSelectProcessTest "work with an empty input
    // collection" tubes on one feature and expects results); multi-point
    // tracks are unchanged (the disk would be a subset of segment caps)
    val seg = track
      .withColumn("__plon", lag(col(lonCol), 1).over(w))
      .withColumn("__plat", lag(col(latCol), 1).over(w))
      .withColumn("__pt", lag(col(millisCol), 1).over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .where(col("__plon").isNotNull || col("__n") === 1)
    val mkTube = udf { (x0: Double, y0: Double, x1: Double, y1: Double, m: Double) =>
      // zero-length lines buffer to EMPTY in JTS: buffer the point instead
      val geom =
        if (x0 == x1 && y0 == y1) GeomOps.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x0, y0))
        else GeomOps.factory.createLineString(Array(
          new org.locationtech.jts.geom.Coordinate(x0, y0),
          new org.locationtech.jts.geom.Coordinate(x1, y1)))
      // meters -> degrees buffer at the segment's mean latitude (same
      // approximation family as the reference's TubeBuilder:56-71)
      val latMid = (y0 + y1) / 2
      val deg = m / (111320.0 * math.max(0.2, math.cos(math.toRadians(latMid))))
      GeomOps.toWkb(geom.buffer(deg))
    }
    seg.select(
      mkTube(coalesce(col("__plon"), col(lonCol)), coalesce(col("__plat"), col(latCol)),
        col(lonCol), col(latCol), lit(bufferMeters)).as("tube_geom"),
      (coalesce(col("__pt"), col(millisCol)) - timeSlackMs).as("t0"),
      (col(millisCol) + timeSlackMs).as("t1"))
  }

  /**
   * Tube select: features intersecting any tube segment in BOTH space
   * and time. Returns features + the matched segment's window, deduped
   * to one row per feature (a feature may hit several segments).
   */
  def tubeSelect(spark: SparkSession,
                 features: DataFrame, idCol: String, lonCol: String, latCol: String, millisCol: String,
                 track: DataFrame, trackLon: String, trackLat: String, trackMillis: String,
                 bufferMeters: Double, timeSlackMs: Long, res: Int = 8): DataFrame = {
    StFunctions.register(spark)
    requireRes(res)
    val segs = tubeSegments(track, trackLon, trackLat, trackMillis, bufferMeters, timeSlackMs)
      .withColumn("__scell", explode(StFunctions.stCellCover(col("tube_geom"), lit(res), lit(CoverBudget))))
    val f = features.withColumn("__fcell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(res)))
    f.join(broadcast(segs), col("__fcell") === col("__scell"))
      .where(SpatialJoin.intersectsCached(
        StFunctions.stMakePoint(col(lonCol), col(latCol)), col("tube_geom")) &&
        col(millisCol).between(col("t0"), col("t1")))
      .groupBy(idCol)
      .agg(min("t0").as("first_window_start"), max("t1").as("last_window_end"),
        count(lit(1)).as("n_segments"))
  }

  /**
   * Planar tube select — corridor membership by exact point-to-segment
   * DISTANCE (JTS Distance.pointToSegment) instead of a polygonized
   * buffer. The distance form is ANSI-SQL-replicable (projection
   * parameter + perpendicular formula), so this variant is the
   * oracle-checked one; semantics match tubeSelect with an exact
   * circular cap corridor rather than the buffer's segment-approximated
   * cap. Buffer is in DEGREES (planar).
   */
  def tubeSelectPlanar(spark: SparkSession,
                       features: DataFrame, idCol: String, lonCol: String, latCol: String, millisCol: String,
                       track: DataFrame, trackLon: String, trackLat: String, trackMillis: String,
                       bufferDeg: Double, timeSlackMs: Long, res: Int = 6): DataFrame = {
    StFunctions.register(spark)
    requireRes(res)
    val w = Window.orderBy(col(trackMillis), col(trackLon), col(trackLat))
    val segGeom = udf { (x0: Double, y0: Double, x1: Double, y1: Double) =>
      GeomOps.toWkb(GeomOps.factory.createLineString(Array(
        new org.locationtech.jts.geom.Coordinate(x0, y0),
        new org.locationtech.jts.geom.Coordinate(x1, y1))))
    }
    val segs = track
      .withColumn("__plon", lag(col(trackLon), 1).over(w))
      .withColumn("__plat", lag(col(trackLat), 1).over(w))
      .withColumn("__pt", lag(col(trackMillis), 1).over(w))
      .where(col("__plon").isNotNull)
      .select(
        segGeom(col("__plon"), col("__plat"), col(trackLon), col(trackLat)).as("seg_geom"),
        (least(col("__plon"), col(trackLon)) - bufferDeg).as("__bx0"),
        (least(col("__plat"), col(trackLat)) - bufferDeg).as("__by0"),
        (greatest(col("__plon"), col(trackLon)) + bufferDeg).as("__bx1"),
        (greatest(col("__plat"), col(trackLat)) + bufferDeg).as("__by1"),
        (col("__pt") - timeSlackMs).as("t0"),
        (col(trackMillis) + timeSlackMs).as("t1"))
      .withColumn("__scell", explode(StFunctions.stCellCover(
        StFunctions.stMakeBBOX(col("__bx0"), col("__by0"), col("__bx1"), col("__by1")),
        lit(res), lit(CoverBudget))))
    val f = features.withColumn("__fcell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(res)))
    f.join(broadcast(segs), col("__fcell") === col("__scell"))
      .where(StFunctions.stDWithinPlanar(
        StFunctions.stMakePoint(col(lonCol), col(latCol)), col("seg_geom"), lit(bufferDeg)) &&
        col(millisCol).between(col("t0"), col("t1")))
      .groupBy(idCol)
      .agg(min("t0").as("first_window_start"), max("t1").as("last_window_end"),
        count(lit(1)).as("n_segments"))
  }

  /** Bearing in degrees [0, 360) from (x0,y0) to (x1,y1), planar. */
  private val bearing = udf { (x0: Double, y0: Double, x1: Double, y1: Double) =>
    val b = math.toDegrees(math.atan2(x1 - x0, y1 - y0))
    (b + 360.0) % 360.0
  }

  /** Route segments with per-segment bearing. `route` is an ordered
    * sequence of (lon, lat) vertices. */
  def routeSegments(route: DataFrame, lonCol: String, latCol: String, seqCol: String): DataFrame = {
    val w = Window.orderBy(col(seqCol))
    route
      .withColumn("__plon", lag(col(lonCol), 1).over(w))
      .withColumn("__plat", lag(col(latCol), 1).over(w))
      .where(col("__plon").isNotNull)
      .select(col("__plon").as("sx0"), col("__plat").as("sy0"),
        col(lonCol).as("sx1"), col(latCol).as("sy1"),
        bearing(col("__plon"), col("__plat"), col(lonCol), col(latCol)).as("seg_bearing"))
  }

  /** Planar route search: distance threshold in DEGREES with the exact
    * point-to-segment distance (oracle-replicable; the haversine
    * variant below keeps the reference's metric semantics). */
  def routeSearchPlanar(spark: SparkSession,
                        features: DataFrame, idCol: String, lonCol: String, latCol: String, headingCol: String,
                        route: DataFrame, routeLon: String, routeLat: String, routeSeq: String,
                        distDeg: Double, headingTolDeg: Double, res: Int = 6,
                        bidirectional: Boolean = false): DataFrame = {
    StFunctions.register(spark)
    requireRes(res)
    val segGeom = udf { (x0: Double, y0: Double, x1: Double, y1: Double) =>
      GeomOps.toWkb(GeomOps.factory.createLineString(Array(
        new org.locationtech.jts.geom.Coordinate(x0, y0),
        new org.locationtech.jts.geom.Coordinate(x1, y1))))
    }
    val segs = routeSegments(route, routeLon, routeLat, routeSeq)
      .withColumn("seg_geom", segGeom(col("sx0"), col("sy0"), col("sx1"), col("sy1")))
      .withColumn("__scell", explode(StFunctions.stCellCover(
        StFunctions.stMakeBBOX(
          least(col("sx0"), col("sx1")) - distDeg, least(col("sy0"), col("sy1")) - distDeg,
          greatest(col("sx0"), col("sx1")) + distDeg, greatest(col("sy0"), col("sy1")) + distDeg),
        lit(res), lit(CoverBudget))))
    val f = features.withColumn("__fcell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(res)))
    val headingDiff =
      least(
        abs(col(headingCol) - col("seg_bearing")),
        lit(360.0) - abs(col(headingCol) - col("seg_bearing")))
    val aligned =
      if (bidirectional) least(headingDiff, abs(headingDiff - lit(180.0))) else headingDiff
    f.join(broadcast(segs), col("__fcell") === col("__scell"))
      .where(StFunctions.stDWithinPlanar(
        StFunctions.stMakePoint(col(lonCol), col(latCol)), col("seg_geom"), lit(distDeg)) &&
        aligned <= headingTolDeg)
      .groupBy(idCol)
      .agg(min(aligned).as("best_heading_diff"), count(lit(1)).as("n_segments"))
  }

  /**
   * Route search: features within `meters` of the route whose heading is
   * within `headingTolDeg` of the local route bearing — with the travel
   * direction by default, either direction when `bidirectional` (the
   * reference RouteSearchProcess's flag). Bearings here are SPHERICAL
   * initial azimuths (great-circle), matching the reference's geodetic
   * calculator — a planar atan2 bearing is off by tens of degrees for
   * diagonal segments away from the equator (atan2(dLon, dLat) ignores
   * that a lon degree is cos(lat) shorter), which would misclassify
   * headings. The planar variant above keeps the planar bearing because
   * its DuckDB oracle replicates that exact formula.
   */
  /**
   * Point2PointProcess analog (reference process/analytic/
   * Point2PointProcess.scala:55-116): per group, sort by time and emit
   * one LineString per consecutive point pair with the pair's
   * [dtg_start, dtg_end]. Faithful semantics:
   *  - groups with size <= minPoints are dropped entirely (the
   *    reference's `lengthCompare(minPoints) > 0` is strictly greater);
   *  - breakOnDay splits each group at UTC day boundaries and drops
   *    days with fewer than 2 points (no cross-day segments);
   *  - filterSingularPoints drops zero-length segments (both endpoints
   *    identical).
   * Distributed: one window per (group[, day]) — no driver collection.
   */
  def point2point(features: DataFrame, groupCol: String,
                  lonCol: String, latCol: String, dtgCol: String,
                  minPoints: Int = 2, breakOnDay: Boolean = false,
                  filterSingularPoints: Boolean = true,
                  tieBreakCols: Seq[String] = Nil): DataFrame = {
    val dayCols: Seq[Column] =
      if (breakOnDay) Seq(dayofyear(col(dtgCol)), year(col(dtgCol))) else Nil
    val parts = col(groupCol) +: dayCols
    // tieBreakCols make the sort total when dtg ties within a group
    val w = Window.partitionBy(parts: _*)
      .orderBy(col(dtgCol) +: tieBreakCols.map(col): _*)
    val wAll = Window.partitionBy(col(groupCol))
    val wDay = Window.partitionBy(parts: _*)
    val lineOf = udf { (x0: Double, y0: Double, x1: Double, y1: Double) =>
      GeomOps.toWkb(GeomOps.factory.createLineString(Array(
        new org.locationtech.jts.geom.Coordinate(x0, y0),
        new org.locationtech.jts.geom.Coordinate(x1, y1))))
    }
    var out = features
      .withColumn("__gn", count(lit(1)).over(wAll))
      .withColumn("__dn", count(lit(1)).over(wDay))
      .withColumn("__plon", lag(col(lonCol), 1).over(w))
      .withColumn("__plat", lag(col(latCol), 1).over(w))
      .withColumn("__pdtg", lag(col(dtgCol), 1).over(w))
      .where(col("__gn") > minPoints && col("__dn") >= 2 && col("__plon").isNotNull)
    if (filterSingularPoints)
      out = out.where(!(col("__plon") === col(lonCol) && col("__plat") === col(latCol)))
    out.select(
      col(groupCol),
      lineOf(col("__plon"), col("__plat"), col(lonCol), col(latCol)).as("geom"),
      col("__pdtg").as(s"${dtgCol}_start"),
      col(dtgCol).as(s"${dtgCol}_end"),
      col("__plon").as("x0"), col("__plat").as("y0"),
      col(lonCol).as("x1"), col(latCol).as("y1"))
  }

  /**
   * TrackLabelProcess analog (reference process/analytic/
   * TrackLabelProcess.scala): one representative row per track — the
   * LAST by `sortCol` when given (ties broken by `tieBreakCols`), an
   * arbitrary-but-deterministic row otherwise.
   */
  def trackLabel(features: DataFrame, trackCol: String,
                 sortCol: Option[String] = None,
                 tieBreakCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = sortCol match {
      case Some(s) => col(s).desc +: tieBreakCols.map(col(_).desc)
      case None => tieBreakCols.map(col(_).desc) match {
        case Seq() => Seq(monotonically_increasing_id())
        case ts => ts
      }
    }
    val w = Window.partitionBy(col(trackCol)).orderBy(order: _*)
    features.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Spherical initial bearing [0,360) from (x0,y0) to (x1,y1), as a
    * codegen-friendly Column formula. */
  private def sphericalBearing(x0: Column, y0: Column, x1: Column, y1: Column): Column = {
    val phi1 = radians(y0); val phi2 = radians(y1); val dl = radians(x1 - x0)
    val b = degrees(atan2(
      sin(dl) * cos(phi2),
      cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dl)))
    (b + 360.0) % 360.0
  }

  def routeSearch(spark: SparkSession,
                  features: DataFrame, idCol: String, lonCol: String, latCol: String, headingCol: String,
                  route: DataFrame, routeLon: String, routeLat: String, routeSeq: String,
                  meters: Double, headingTolDeg: Double, res: Int = 8,
                  bidirectional: Boolean = false): DataFrame = {
    StFunctions.register(spark)
    requireRes(res)
    val segGeom = udf { (x0: Double, y0: Double, x1: Double, y1: Double) =>
      GeomOps.toWkb(GeomOps.factory.createLineString(Array(
        new org.locationtech.jts.geom.Coordinate(x0, y0),
        new org.locationtech.jts.geom.Coordinate(x1, y1))))
    }
    // candidate buffer scaled by 1/cos(max segment latitude): one degree
    // of longitude shrinks toward the poles, so a fixed factor would
    // miss features that the haversine refine accepts above ~48 deg lat
    val bufferDeg = udf { (y0: Double, y1: Double, m: Double) =>
      val maxAbsLat = math.min(89.0, math.max(math.abs(y0), math.abs(y1)) + m / 110000.0)
      m / (110000.0 * math.cos(math.toRadians(maxAbsLat)))
    }
    val segs = routeSegments(route, routeLon, routeLat, routeSeq)
      .withColumn("seg_bearing",
        sphericalBearing(col("sx0"), col("sy0"), col("sx1"), col("sy1")))
      .withColumn("seg_geom", segGeom(col("sx0"), col("sy0"), col("sx1"), col("sy1")))
      .withColumn("__scell", explode(StFunctions.stCellCover(
        StFunctions.stBuffer(col("seg_geom"), bufferDeg(col("sy0"), col("sy1"), lit(meters))),
        lit(res), lit(CoverBudget))))
    val f = features.withColumn("__fcell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(res)))
    val headingDiff =
      least(
        abs(col(headingCol) - col("seg_bearing")),
        lit(360.0) - abs(col(headingCol) - col("seg_bearing")))
    val aligned =
      if (bidirectional) least(headingDiff, abs(headingDiff - 180.0)) else headingDiff
    f.join(broadcast(segs), col("__fcell") === col("__scell"))
      .where(StFunctions.stDWithin(
        StFunctions.stMakePoint(col(lonCol), col(latCol)), col("seg_geom"), lit(meters)) &&
        aligned <= headingTolDeg)
      .groupBy(idCol)
      .agg(min(aligned).as("best_heading_diff"), count(lit(1)).as("n_segments"))
  }

  /**
   * Time-bin and union tube geometries — NoGapFill.timeBinAndUnion
   * (tube/TubeBuilder.scala:133-160, fixture TubeBinTest:40-66):
   * features ordered by time split into sequential equal-size bins,
   * each bin unioned to one geometry with the bin's [first, last]
   * start-time range. maxBins = 0 means no binning (one feature per
   * bin), 1 means a single bin, otherwise binSize = ceil(n / maxBins).
   *
   * The input is a tube/track table — small by construction (the
   * reference collects it outright) — so the single global time-order
   * window is a deliberate one-partition pass; the union aggregate
   * itself is associative and map-side combines.
   */
  def timeBinAndUnion(tubes: DataFrame, geomCol: String, millisCol: String,
                      maxBins: Int): DataFrame = {
    require(maxBins >= 0, s"maxBins must be >= 0 (got $maxBins)")
    val w = Window.orderBy(col(millisCol))
    val rn = tubes
      .withColumn("__rn", row_number().over(w) - 1)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(lit(1))))
    val bin = maxBins match {
      case 0 => col("__rn")
      case 1 => lit(0L)
      // ceil division: n / maxBins + (n % maxBins == 0 ? 0 : 1)
      case m =>
        val binSize = (col("__n") / m).cast("long") +
          when(col("__n") % m === 0, 0L).otherwise(1L)
        (col("__rn") / binSize).cast("long")
    }
    rn.withColumn("__bin", bin.cast("long"))
      .groupBy(col("__bin").as("bin"))
      .agg(
        Stats.geomUnion(col(geomCol)).as(geomCol),
        min(col(millisCol)).as("start"),
        max(col(millisCol)).as("end"))
      .orderBy("bin")
  }
}
