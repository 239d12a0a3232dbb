package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/**
 * Pure-JVM geometry kernels over JTS (jts-core 1.20, shipped with Spark).
 * The engine's column convention is BinaryType WKB (SURVEY.md §7.4.6:
 * avoid semi-private UDT registration in Spark 4); these statics are the
 * shared implementation behind the st_* UDF surface and the join
 * refinement operators.
 *
 * Readers/writers are ThreadLocal: JTS parsers are not thread-safe and
 * executor threads are long-lived, so per-thread reuse removes per-row
 * allocation from the hot path.
 */
object GeomOps {

  val factory = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 4326)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))

  /** Meters per distance unit — the ONE table shared by every surface
    * that accepts a unit (CQL DWITHIN/BEYOND, GeoJSON $dwithin, and the
    * $dwithin pruning envelope). Reference unit set: ECQL's
    * {meters, kilometers, feet, statute miles} plus the common short and
    * British spellings. Unknown units throw everywhere — a pruning path
    * that silently defaulted to meters while the predicate threw would
    * under-pad the box and drop matching rows. */
  def unitToMeters(unit: String): Double = unit.trim.toLowerCase match {
    case "meters" | "meter" | "metre" | "metres" | "m" => 1.0
    case "kilometers" | "kilometer" | "kilometres" | "km" => 1000.0
    case "feet" | "ft" => 0.3048
    case "statute miles" | "miles" | "mi" => 1609.344
    case u => throw new IllegalArgumentException(s"unsupported distance unit '$u'")
  }

  /** Lenient WKT parse for ingest paths: malformed text -> null, never
    * an exception (the converter contract: a bad value nulls the field,
    * it does not fail the job). The ONE implementation behind the
    * converter/transform/config UDFs. */
  def wktToWkbOrNull(s: String): Array[Byte] =
    if (s == null) null
    else {
      try toWkb(fromWkt(s))
      catch { case _: Exception => null }
    }

  def fromWkb(b: Array[Byte]): Geometry = if (b == null) null else wkbReader.get.read(b)
  def toWkb(g: Geometry): Array[Byte] = if (g == null) null else wkbWriter.get.write(g)
  def fromWkt(s: String): Geometry = if (s == null) null else wktReader.get.read(s)
  def toWkt(g: Geometry): String = if (g == null) null else wktWriter.get.write(g)

  def point(x: Double, y: Double): Geometry = factory.createPoint(new Coordinate(x, y))
  /** 3D point (m stored as z) + a 3-dim WKB writer for it — only
    * st_makePointM produces these; WKBReader reads them back fine. */
  def pointM(x: Double, y: Double, m: Double): Geometry =
    factory.createPoint(new Coordinate(x, y, m))
  private val wkbWriter3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3))
  def toWkb3(g: Geometry): Array[Byte] = if (g == null) null else wkbWriter3.get.write(g)

  def bbox(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry =
    factory.toGeometry(new Envelope(xmin, xmax, ymin, ymax))

  /** Earth mean radius in meters (same constant family as the reference's
    * spatial4j haversine distance, SpatialRelationFunctions.scala:129-133). */
  val EarthRadiusM: Double = 6371008.7714

  /** Haversine great-circle distance in meters between two lon/lat points. */
  def haversineMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Great-circle distance between the closest representative points of two
    * geometries (centroid-free: uses JTS nearestPoints in degree space,
    * then haversine on that pair — exact for points, good approximation
    * for small extents). */
  def distanceSphereMeters(a: Geometry, b: Geometry): Double = {
    val pts = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(a, b)
    haversineMeters(pts(0).x, pts(0).y, pts(1).x, pts(1).y)
  }

  // WGS84 ellipsoid (the reference's spheroid distances use GeoTools
  // orthodromic on the same datum, GeometricDistanceFunctions.scala:20-52)
  private val WgsA = 6378137.0
  private val WgsF = 1.0 / 298.257223563
  private val WgsB = (1.0 - WgsF) * WgsA

  /**
   * WGS84 geodesic (spheroid) distance in meters — Vincenty's inverse
   * formula (T. Vincenty, Survey Review 23(176), 1975). Validated
   * against the published closed forms: 1 deg of equator =
   * 111319.4908 m, quarter meridian = 10001965.729 m. Falls back to
   * haversine for the nearly-antipodal non-convergent region (error
   * there is bounded by the flattening, ~0.5%).
   */
  def vincentyMeters(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1 - WgsF) * math.tan(math.toRadians(lat1)))
    val u2r = math.atan((1 - WgsF) * math.tan(math.toRadians(lat2)))
    val sU1 = math.sin(u1); val cU1 = math.cos(u1)
    val sU2 = math.sin(u2r); val cU2 = math.cos(u2r)
    var lam = L
    var iter = 0
    var converged = false
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cos2A = 0.0; var cos2SM = 0.0
    while (iter < 200 && !converged) {
      val sl = math.sin(lam); val cl = math.cos(lam)
      val t1 = cU2 * sl
      val t2 = cU1 * sU2 - sU1 * cU2 * cl
      sinSigma = math.sqrt(t1 * t1 + t2 * t2)
      if (sinSigma == 0) return 0.0 // coincident
      cosSigma = sU1 * sU2 + cU1 * cU2 * cl
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cU1 * cU2 * sl / sinSigma
      cos2A = 1 - sinAlpha * sinAlpha
      cos2SM = if (cos2A == 0) 0.0 else cosSigma - 2 * sU1 * sU2 / cos2A
      val c = WgsF / 16 * cos2A * (4 + WgsF * (4 - 3 * cos2A))
      val lamNew = L + (1 - c) * WgsF * sinAlpha *
        (sigma + c * sinSigma * (cos2SM + c * cosSigma * (-1 + 2 * cos2SM * cos2SM)))
      converged = math.abs(lamNew - lam) < 1e-12
      lam = lamNew
      iter += 1
    }
    if (!converged) return haversineMeters(lon1, lat1, lon2, lat2) // antipodal
    val uu = cos2A * (WgsA * WgsA - WgsB * WgsB) / (WgsB * WgsB)
    val aa = 1 + uu / 16384 * (4096 + uu * (-768 + uu * (320 - 175 * uu)))
    val bb = uu / 1024 * (256 + uu * (-128 + uu * (74 - 47 * uu)))
    val dSigma = bb * sinSigma * (cos2SM + bb / 4 *
      (cosSigma * (-1 + 2 * cos2SM * cos2SM) -
        bb / 6 * cos2SM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SM * cos2SM)))
    WgsB * aa * (sigma - dSigma)
  }

  /** Spheroid distance between the closest representative points of two
    * geometries (nearest pair in degree space, then Vincenty). */
  def distanceSpheroidMeters(a: Geometry, b: Geometry): Double = {
    val pts = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(a, b)
    vincentyMeters(pts(0).x, pts(0).y, pts(1).x, pts(1).y)
  }

  /** Geodesic (spheroid) length of a line: sum of Vincenty segments. */
  def lengthSpheroidMeters(g: Geometry): Double = {
    val cs = g.getCoordinates
    var i = 1
    var acc = 0.0
    while (i < cs.length) {
      acc += vincentyMeters(cs(i - 1).x, cs(i - 1).y, cs(i).x, cs(i).y)
      i += 1
    }
    acc
  }

  /**
   * Conservative (superset) envelope expansion for a metric radius: any
   * point whose haversine distance to the envelope is <= meters lies
   * inside the expanded envelope. Uses 110,000 m/deg (< the true
   * 111,195 m/deg at R=6371008.77) so the degree deltas over-cover, and
   * the worst-case cos(lat) over the expanded band for longitude. Near
   * the poles longitude becomes unconstrained.
   */
  def expandEnvelopeMeters(env: Envelope, meters: Double): Envelope = {
    val dLat = meters / 110000.0
    val maxAbsLat = math.max(math.abs(env.getMinY - dLat), math.abs(env.getMaxY + dLat))
    val dLon =
      if (maxAbsLat >= 89.0) 360.0
      else meters / (110000.0 * math.cos(math.toRadians(maxAbsLat)))
    new Envelope(env.getMinX - dLon, env.getMaxX + dLon,
      env.getMinY - dLat, env.getMaxY + dLat)
  }

  /** Envelope expanded by a planar degree radius (st_dwithinPlanar). */
  def expandEnvelopeDeg(env: Envelope, deg: Double): Envelope =
    new Envelope(env.getMinX - deg, env.getMaxX + deg,
      env.getMinY - deg, env.getMaxY + deg)

  /** Geodesic length of a line in meters (sum of haversine segment lengths). */
  def lengthSphereMeters(g: Geometry): Double = {
    val cs = g.getCoordinates
    var i = 1
    var acc = 0.0
    while (i < cs.length) {
      acc += haversineMeters(cs(i - 1).x, cs(i - 1).y, cs(i).x, cs(i).y)
      i += 1
    }
    acc
  }

  /** Approximate geodesic point buffer: meters -> a polygon circle around a
    * point (n-point ring; degree radii scaled by latitude for the east-west
    * axis). Mirrors the semantics of the reference's fast st_bufferPoint
    * (GeometricProcessingFunctions.scala: meters -> degrees circle). */
  def bufferPointMeters(p: Geometry, meters: Double, nPoints: Int = 100): Geometry = {
    val c = p.getCoordinate
    val latR = meters / 111320.0 // meters per degree latitude
    val lonR = meters / (111320.0 * math.max(0.01, math.cos(math.toRadians(c.y))))
    val coords = new Array[Coordinate](nPoints + 1)
    var i = 0
    while (i < nPoints) {
      val t = 2 * math.Pi * i / nPoints
      coords(i) = new Coordinate(c.x + lonR * math.cos(t), c.y + latR * math.sin(t))
      i += 1
    }
    coords(nPoints) = coords(0)
    factory.createPolygon(coords)
  }

  /** The world polygon query literals are trimmed to — the reference's
    * FilterHelper.WholeWorldPolygon. */
  val worldPolygon: Geometry = bbox(-180, -90, 180, 90)

  /** Does the geometry cover the whole world (reference's
    * FilterHelper.isWholeWorld:180)? */
  def coversWorld(g: Geometry): Boolean = g != null && g.union().covers(worldPolygon)

  /** A query literal normalized the way the reference's query planner
    * does it (FilterHelper.visitBinarySpatialOp:54-77): trimmed to the
    * world polygon, then IDL dateline-split, returned as the flat list
    * of parts to OR together. `None` means the trimmed literal covers
    * the whole world (the caller's INCLUDE case — the world rectangle
    * must NOT reach the dateline unwrap, whose 360-degree edges would
    * collapse it to a sliver); `Some(Nil)` means the literal lies
    * entirely outside the world (EXCLUDE). */
  def queryPartsOrWorld(g: Geometry): Option[Seq[Geometry]] = {
    val trimmed = g.intersection(worldPolygon)
    if (trimmed.isEmpty) Some(Nil)
    else if (coversWorld(trimmed)) None
    else Some(datelineWrap(trimmed) match {
      case gc: GeometryCollection => (0 until gc.getNumGeometries).map(gc.getGeometryN).toSeq
      case one => Seq(one)
    })
  }

  /** queryPartsOrWorld with the whole-world case flattened to the world
    * polygon itself (for callers whose operator has no INCLUDE rule). */
  def queryParts(g: Geometry): Seq[Geometry] =
    queryPartsOrWorld(g).getOrElse(Seq(worldPolygon))

  /** The reference's full dateline rule (st_antimeridianSafeGeom /
    * st_idlSafeGeom — GeometricProcessingFunctions.scala:41-56 delegating
    * to GeohashUtils.getInternationalDateLineSafeGeometry:724-780 +
    * spatial4j dateline processing): out-of-range longitudes are
    * translated into [-180,180] PER COORDINATE, then any segment that
    * jumps more than 180 degrees of longitude is interpreted as taking
    * the short way around the globe (so a "wide" polygon is an
    * antimeridian-crossing polygon), and the result is split into
    * [-180,180] pieces. */
  def antimeridianSafe(g: Geometry): Geometry = {
    val copy = g.copy()
    val env = copy.getEnvelopeInternal
    if (env.getMinX < -180 || env.getMaxX > 180) {
      copy.apply(new CoordinateFilter {
        override def filter(c: Coordinate): Unit =
          c.x += (((c.x + 180) / 360.0).floor * -360).toInt
      })
      copy.geometryChanged()
    }
    datelineWrap(copy)
  }

  /** Apply the short-way segment interpretation and split the result
    * into world strips translated back to [-180,180]. Coordinates are
    * assumed already within [-180,180]; the unwrap step may carry them
    * outside before the strip split brings every piece back. */
  def datelineWrap(g: Geometry): Geometry = {
    val unwrapped = unwrapGeom(g)
    val env = unwrapped.getEnvelopeInternal
    if (env.getMinX >= -180 && env.getMaxX <= 180) unwrapped
    else {
      val kMin = math.floor((env.getMinX + 180) / 360).toInt
      val kMax = math.floor((env.getMaxX + 180 - 1e-12) / 360).toInt
      val parts = (kMin to kMax).flatMap { k =>
        val strip = bbox(k * 360.0 - 180, -90, k * 360.0 + 180, 90)
        val piece = unwrapped.intersection(strip)
        if (piece.isEmpty) None
        else Some(if (k == 0) piece else translate(piece, -360.0 * k, 0))
      }
      if (parts.isEmpty) factory.createGeometryCollection(Array.empty)
      else if (parts.size == 1) parts.head
      else factory.buildGeometry(java.util.Arrays.asList(parts: _*))
    }
  }

  /** Rewrite each linear component so consecutive vertices differ by at
    * most 180 degrees of longitude (adding +-360 where a segment would
    * otherwise take the long way). Falls back to the input component if
    * unwrapping would leave a ring unclosed (a ring circling the globe). */
  private def unwrapGeom(g: Geometry): Geometry = g match {
    case e if e.isEmpty => e // empty rings have no coordinates to walk
    case p: Polygon =>
      val shell = unwrapRing(p.getExteriorRing.getCoordinates)
      val shellMid = (shell.map(_.x).min + shell.map(_.x).max) / 2
      val holes = (0 until p.getNumInteriorRing).map { i =>
        val h = unwrapRing(p.getInteriorRingN(i).getCoordinates)
        // re-anchor the hole next to its shell (each ring unwraps from
        // its own first vertex, which may sit a world away)
        val hMid = (h.map(_.x).min + h.map(_.x).max) / 2
        val k = math.round((shellMid - hMid) / 360.0)
        val shifted = if (k == 0) h else h.map(c => new Coordinate(c.x + 360.0 * k, c.y))
        factory.createLinearRing(shifted)
      }.toArray
      factory.createPolygon(factory.createLinearRing(shell), holes)
    case l: org.locationtech.jts.geom.LineString if !l.isInstanceOf[org.locationtech.jts.geom.LinearRing] =>
      factory.createLineString(unwrapLine(l.getCoordinates))
    case m: org.locationtech.jts.geom.GeometryCollection =>
      val parts = (0 until m.getNumGeometries).map(i => unwrapGeom(m.getGeometryN(i)))
      factory.buildGeometry(java.util.Arrays.asList(parts: _*))
    case other => other // points and rings-as-geometries: nothing to unwrap
  }

  private def unwrapLine(cs: Array[Coordinate]): Array[Coordinate] = {
    val out = new Array[Coordinate](cs.length)
    var i = 0
    while (i < cs.length) {
      if (i == 0) out(0) = new Coordinate(cs(0))
      else {
        var x = cs(i).x
        val prev = out(i - 1).x
        while (x - prev > 180) x -= 360
        while (prev - x > 180) x += 360
        out(i) = new Coordinate(x, cs(i).y)
      }
      i += 1
    }
    out
  }

  private def unwrapRing(cs: Array[Coordinate]): Array[Coordinate] = {
    val out = unwrapLine(cs)
    // a ring that accumulates a net +-360 circles the globe; the wrap
    // interpretation is meaningless there — keep the literal ring
    if (math.abs(out(out.length - 1).x - out(0).x) > 1e-9) cs.map(new Coordinate(_)) else out
  }

  def translate(g: Geometry, dx: Double, dy: Double): Geometry = {
    val out = g.copy()
    out.apply(new CoordinateFilter {
      override def filter(c: Coordinate): Unit = { c.x += dx; c.y += dy }
    })
    out.geometryChanged()
    out
  }

  // ---- Geohash: delegates to the bit-precision graft.cells.GeoHash ----

  def geohash(lon: Double, lat: Double, precisionBits: Int): String =
    graft.cells.GeoHash(lon, lat, math.min(math.max(1, precisionBits), 63)).hash

  /** Decode a geohash to its bbox (lonMin, latMin, lonMax, latMax). */
  def geohashBBox(hash: String): (Double, Double, Double, Double) = {
    val gh = graft.cells.GeoHash(hash)
    (gh.lonMin, gh.latMin, gh.lonMax, gh.latMax)
  }

  def geohashCentroid(hash: String): Geometry = {
    val gh = graft.cells.GeoHash(hash)
    point(gh.x, gh.y)
  }

  def geohashGeom(hash: String): Geometry = {
    val gh = graft.cells.GeoHash(hash)
    bbox(gh.lonMin, gh.latMin, gh.lonMax, gh.latMax)
  }

  /**
   * Degrees-minutes-seconds rendering, byte-for-byte the reference's
   * (GeometricOutputFunctions.scala:50-64): degrees come from FLOOR, so
   * -76.5 renders 77°30'W (not 76°30'W) — minutes/seconds measure the
   * distance up from the floored degree, exactly like the reference.
   */
  def asLatLonText(lon: Double, lat: Double): String = {
    def dms(v: Double, pos: Char, neg: Char): String = {
      val d = math.floor(v)
      val dec = v - d
      val m = math.floor(dec * 60)
      val s = (dec * 60 - m) * 60
      f"${math.abs(d)}%1.0f°$m%1.0f'$s%1.3f" + "\"" + (if (d < 0) neg else pos)
    }
    s"${dms(lat, 'N', 'S')} ${dms(lon, 'E', 'W')}"
  }
}
