package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.locationtech.jts.geom.{Geometry, LineString, MultiLineString, Point, Polygon, Coordinate}
import graft.geom.{GeomOps => G, GeoJson}
import graft.cells.{Cells, XZ2, BinnedTime}

/**
 * The engine's scalar spatial function surface: the same names and
 * semantics as the reference's 60+ registered UDFs (see /root/reference/
 * geomesa-spark/geomesa-spark-jts/.../udf/ — constructors,
 * accessors, DE-9IM relations, measures, outputs, casts, processing),
 * plus our hierarchical cell functions (the H3-style index that replaces
 * the reference's Accumulo Z-key machinery).
 *
 * Column convention: geometry = BinaryType WKB. Every function is
 * null-propagating (null in -> null out), matching the reference's
 * `nullableUDF` wrapper semantics.
 */
object StFunctions {

  // -- null-safe helpers ------------------------------------------------
  @inline private def nn[A <: AnyRef, B](a: A)(f: A => B): Any =
    if (a == null) null else f(a)
  @inline private def nn2[A <: AnyRef, B <: AnyRef, C](a: A, b: B)(f: (A, B) => C): Any =
    if (a == null || b == null) null else f(a, b)

  private def g(b: Array[Byte]): Geometry = G.fromWkb(b)
  private def w(geom: Geometry): Array[Byte] = G.toWkb(geom)

  // -- constructors -----------------------------------------------------
  val stGeomFromWKT: UserDefinedFunction = udf((s: String) => nn(s)(x => w(G.fromWkt(x))).asInstanceOf[Array[Byte]])
  val stGeomFromWKB: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x))).asInstanceOf[Array[Byte]])
  val stGeomFromGeoJSON: UserDefinedFunction = udf((s: String) => nn(s)(x => w(graft.geom.GeoJson.read(x))).asInstanceOf[Array[Byte]])
  val stMakePoint: UserDefinedFunction = udf((x: Double, y: Double) => w(G.point(x, y)))
  val stMakePointM: UserDefinedFunction = udf((x: Double, y: Double, m: Double) => G.toWkb3(G.pointM(x, y, m)))
  val stMakeBBOX: UserDefinedFunction = udf((xmin: Double, ymin: Double, xmax: Double, ymax: Double) => w(G.bbox(xmin, ymin, xmax, ymax)))
  val stMakeBox2D: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b) { (x, y) =>
    val p1 = g(x).asInstanceOf[Point]; val p2 = g(y).asInstanceOf[Point]
    w(G.bbox(math.min(p1.getX, p2.getX), math.min(p1.getY, p2.getY), math.max(p1.getX, p2.getX), math.max(p1.getY, p2.getY)))
  }.asInstanceOf[Array[Byte]])
  val stMakePolygon: UserDefinedFunction = udf((line: Array[Byte]) => nn(line) { x =>
    val l = g(x).asInstanceOf[LineString]
    w(G.factory.createPolygon(l.getCoordinateSequence))
  }.asInstanceOf[Array[Byte]])
  val stMakeLine: UserDefinedFunction = udf((pts: Seq[Array[Byte]]) => nn(pts) { ps =>
    val coords = ps.map(p => g(p).getCoordinate).toArray
    w(G.factory.createLineString(coords))
  }.asInstanceOf[Array[Byte]])
  val stLineFromText: UserDefinedFunction = udf((s: String) => nn(s)(x => w(G.fromWkt(x).asInstanceOf[LineString])).asInstanceOf[Array[Byte]])
  val stPointFromText: UserDefinedFunction = udf((s: String) => nn(s)(x => w(G.fromWkt(x).asInstanceOf[Point])).asInstanceOf[Array[Byte]])
  val stPolygonFromText: UserDefinedFunction = udf((s: String) => nn(s)(x => w(G.fromWkt(x).asInstanceOf[Polygon])).asInstanceOf[Array[Byte]])
  val stPointFromWKB: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).asInstanceOf[Point])).asInstanceOf[Array[Byte]])
  // 2-arg like the reference (geohash, precision-in-BITS): decodes the
  // first `prec` interleaved bits, so odd precisions (25, 27, 40...)
  // give the exact reference cell, not a character-rounded one
  private def ghAt(s: String, prec: Int) =
    graft.cells.GeoHash(s, math.min(math.max(1, prec), math.min(63, s.length * 5)))
  val stGeomFromGeoHash: UserDefinedFunction = udf((s: String, prec: Int) =>
    nn(s) { x =>
      // zero decodable bits (empty hash OR precision <= 0) = the whole
      // world, the reference's 0-precision cell — not an error and not
      // a 1-bit hemisphere
      if (x.isEmpty || prec <= 0) w(G.bbox(-180, -90, 180, 90))
      else {
        val gh = ghAt(x, prec)
        w(G.bbox(gh.lonMin, gh.latMin, gh.lonMax, gh.latMax))
      }
    }.asInstanceOf[Array[Byte]])
  val stPointFromGeoHash: UserDefinedFunction = udf((s: String, prec: Int) =>
    nn(s) { x =>
      if (x.isEmpty || prec <= 0) w(G.point(0, 0))
      else {
        val gh = ghAt(x, prec)
        w(G.point(gh.x, gh.y))
      }
    }.asInstanceOf[Array[Byte]])

  // -- accessors --------------------------------------------------------
  val stBoundary: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).getBoundary)).asInstanceOf[Array[Byte]])
  val stCoordDim: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(_ => 2).asInstanceOf[Integer])
  val stDimension: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).getDimension).asInstanceOf[Integer])
  val stEnvelope: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).getEnvelope)).asInstanceOf[Array[Byte]])
  val stExteriorRing: UserDefinedFunction = udf((b: Array[Byte]) => nn(b) { x =>
    g(x) match { case p: Polygon => w(p.getExteriorRing); case _ => null }
  }.asInstanceOf[Array[Byte]])
  val stGeometryN: UserDefinedFunction = udf((b: Array[Byte], n: Int) => nn(b)(x => w(g(x).getGeometryN(n - 1))).asInstanceOf[Array[Byte]])
  val stGeometryType: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).getGeometryType).asInstanceOf[String])
  val stInteriorRingN: UserDefinedFunction = udf((b: Array[Byte], n: Int) => nn(b) { x =>
    g(x) match {
      case p: Polygon if n >= 1 && n <= p.getNumInteriorRing => w(p.getInteriorRingN(n - 1))
      case _ => null
    }
  }.asInstanceOf[Array[Byte]])
  val stIsClosed: UserDefinedFunction = udf((b: Array[Byte]) => nn(b) { x =>
    g(x) match {
      case l: LineString => l.isClosed
      case m: MultiLineString => m.isClosed // closed iff EVERY component is
      case _ => true
    }
  }.asInstanceOf[java.lang.Boolean])
  val stIsCollection: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).getNumGeometries > 1 || g(x).getGeometryType.startsWith("Multi") || g(x).getGeometryType == "GeometryCollection").asInstanceOf[java.lang.Boolean])
  val stIsEmpty: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).isEmpty).asInstanceOf[java.lang.Boolean])
  val stIsRing: UserDefinedFunction = udf((b: Array[Byte]) => nn(b) { x =>
    g(x) match { case l: LineString => l.isClosed && l.isSimple; case _ => false }
  }.asInstanceOf[java.lang.Boolean])
  val stIsSimple: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).isSimple).asInstanceOf[java.lang.Boolean])
  val stIsValid: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).isValid).asInstanceOf[java.lang.Boolean])
  val stNumGeometries: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).getNumGeometries).asInstanceOf[Integer])
  val stNumPoints: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).getNumPoints).asInstanceOf[Integer])
  val stPointN: UserDefinedFunction = udf((b: Array[Byte], n: Int) => nn(b) { x =>
    g(x) match {
      case l: LineString =>
        val i = if (n < 0) l.getNumPoints + n else n - 1
        if (i >= 0 && i < l.getNumPoints) w(l.getPointN(i)) else null
      case _ => null
    }
  }.asInstanceOf[Array[Byte]])
  val stX: UserDefinedFunction = udf((b: Array[Byte]) => nn(b) { x =>
    g(x) match { case p: Point => java.lang.Double.valueOf(p.getX); case _ => null }
  }.asInstanceOf[java.lang.Double])
  val stY: UserDefinedFunction = udf((b: Array[Byte]) => nn(b) { x =>
    g(x) match { case p: Point => java.lang.Double.valueOf(p.getY); case _ => null }
  }.asInstanceOf[java.lang.Double])

  // -- DE-9IM relations & measures -------------------------------------
  private def rel(f: (Geometry, Geometry) => Boolean) =
    udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b)((x, y) => f(g(x), g(y))).asInstanceOf[java.lang.Boolean])

  val stContains: UserDefinedFunction = rel(_ contains _)
  val stCovers: UserDefinedFunction = rel(_ covers _)
  val stCrosses: UserDefinedFunction = rel(_ crosses _)
  val stDisjoint: UserDefinedFunction = rel(_ disjoint _)
  val stEquals: UserDefinedFunction = rel(_ equalsTopo _)
  val stIntersects: UserDefinedFunction = rel(_ intersects _)
  val stOverlaps: UserDefinedFunction = rel(_ overlaps _)
  val stTouches: UserDefinedFunction = rel(_ touches _)
  val stWithin: UserDefinedFunction = rel(_ within _)
  val stRelate: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b)((x, y) => g(x).relate(g(y)).toString).asInstanceOf[String])
  val stRelateBool: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte], m: String) =>
    (if (a == null || b == null || m == null) null else java.lang.Boolean.valueOf(g(a).relate(g(b), m))): java.lang.Boolean)
  val stTranslate: UserDefinedFunction = udf((b: Array[Byte], dx: Double, dy: Double) => nn(b)(x => w(G.translate(g(x), dx, dy))).asInstanceOf[Array[Byte]])
  /** Per-geometry convex hull (reference SpatialRelationFunctions.scala:113). */
  val stConvexHull: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).convexHull())).asInstanceOf[Array[Byte]])

  val stArea: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).getArea).asInstanceOf[java.lang.Double])
  val stCentroid: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).getCentroid)).asInstanceOf[Array[Byte]])
  val stClosestPoint: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b) { (x, y) =>
    val pts = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(g(x), g(y))
    w(G.factory.createPoint(pts(0)))
  }.asInstanceOf[Array[Byte]])
  val stDistance: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b)((x, y) => g(x).distance(g(y))).asInstanceOf[java.lang.Double])
  val stDistanceSphere: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b)((x, y) => G.distanceSphereMeters(g(x), g(y))).asInstanceOf[java.lang.Double])
  val stLength: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => g(x).getLength).asInstanceOf[java.lang.Double])
  val stLengthSphere: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => G.lengthSphereMeters(g(x))).asInstanceOf[java.lang.Double])
  val stAggregateDistanceSphere: UserDefinedFunction = udf((gs: Seq[Array[Byte]]) => nn(gs) { xs =>
    val geoms = xs.map(g)
    geoms.sliding(2).collect { case Seq(p, q) => G.distanceSphereMeters(p, q) }.sum
  }.asInstanceOf[java.lang.Double])
  // Spheroid variants: WGS84 geodesic (Vincenty inverse), matching the
  // reference's GeoTools orthodromic semantics — no longer haversine
  // aliases (sphere vs spheroid differ by up to ~0.5%).
  val stDistanceSpheroid: UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b)((x, y) => G.distanceSpheroidMeters(g(x), g(y))).asInstanceOf[java.lang.Double])
  val stLengthSpheroid: UserDefinedFunction =
    udf((b: Array[Byte]) => nn(b)(x => G.lengthSpheroidMeters(g(x))).asInstanceOf[java.lang.Double])
  val stAggregateDistanceSpheroid: UserDefinedFunction = udf((gs: Seq[Array[Byte]]) => nn(gs) { xs =>
    val geoms = xs.map(g)
    geoms.sliding(2).collect { case Seq(p, q) => G.distanceSpheroidMeters(p, q) }.sum
  }.asInstanceOf[java.lang.Double])

  val stBuffer: UserDefinedFunction = udf((b: Array[Byte], d: Double) => nn(b)(x => w(g(x).buffer(d))).asInstanceOf[Array[Byte]])
  // antimeridianSafe like the reference (GeometricProcessingFunctions
  // .scala:38 pipes the circle through ST_antimeridianSafeGeom), so a
  // buffer near ±180 wraps into both hemispheres
  val stBufferPoint: UserDefinedFunction = udf((b: Array[Byte], meters: Double) =>
    nn(b)(x => w(G.antimeridianSafe(G.bufferPointMeters(g(x), meters)))).asInstanceOf[Array[Byte]])
  val stAntimeridianSafeGeom: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(G.antimeridianSafe(g(x)))).asInstanceOf[Array[Byte]])
  val stIntersection: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => nn2(a, b)((x, y) => w(g(x).intersection(g(y)))).asInstanceOf[Array[Byte]])
  val stDWithin: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte], meters: Double) =>
    nn2(a, b)((x, y) => G.distanceSphereMeters(g(x), g(y)) < meters).asInstanceOf[java.lang.Boolean])
  /** Planar (degree-space) distance-within — JTS cartesian distance. The
    * oracle-safe variant (no trig) and the reference's st_dwithin
    * cartesian twin. */
  val stDWithinPlanar: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte], deg: Double) =>
    nn2(a, b)((x, y) => g(x).distance(g(y)) < deg).asInstanceOf[java.lang.Boolean])

  // -- outputs ----------------------------------------------------------
  val stAsBinary: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x))).asInstanceOf[Array[Byte]])
  val stAsText: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => G.toWkt(g(x))).asInstanceOf[String])
  val stAsGeoJSON: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => GeoJson.write(g(x))).asInstanceOf[String])
  val stAsLatLonText: UserDefinedFunction = udf((b: Array[Byte]) => nn(b) { x =>
    g(x) match { case p: Point => G.asLatLonText(p.getX, p.getY); case _ => null }
  }.asInstanceOf[String])
  val stGeoHash: UserDefinedFunction = udf((b: Array[Byte], bits: Int) => nn(b) { x =>
    val c = g(x).getCentroid
    // bit precision like the reference: ceil(bits/5) chars, rest zeroed
    graft.cells.GeoHash(c.getX, c.getY, math.min(math.max(1, bits), 63)).hash
  }.asInstanceOf[String])

  // -- casts ------------------------------------------------------------
  val stCastToPoint: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).asInstanceOf[Point])).asInstanceOf[Array[Byte]])
  val stCastToPolygon: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).asInstanceOf[Polygon])).asInstanceOf[Array[Byte]])
  val stCastToLineString: UserDefinedFunction = udf((b: Array[Byte]) => nn(b)(x => w(g(x).asInstanceOf[LineString])).asInstanceOf[Array[Byte]])
  val stByteArray: UserDefinedFunction = udf((s: String) => nn(s)(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[Array[Byte]])

  // -- hierarchical cells (our H3-style index; SURVEY.md §7.0) ----------
  val stCell: UserDefinedFunction = udf((b: Array[Byte], res: Int) => nn(b) { x =>
    val c = g(x).getCentroid
    Cells.cell(c.getX, c.getY, res)
  }.asInstanceOf[java.lang.Long])
  val stCellOfXY: UserDefinedFunction = udf((lon: Double, lat: Double, res: Int) => Cells.cell(lon, lat, res))
  val stCellCover: UserDefinedFunction = udf((b: Array[Byte], res: Int, maxCells: Int) => nn(b) { x =>
    val geom = g(x)
    val env = geom.getEnvelopeInternal
    val candidates = Cells.coverBBox(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, res, maxCells)
    // exact refine: keep cells whose envelope intersects the geometry
    if (geom.isRectangle || geom.getNumPoints <= 1) candidates
    else {
      val prepared = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(geom)
      candidates.filter { cell =>
        val (x0, y0, x1, y1) = Cells.envelope(cell)
        prepared.intersects(G.bbox(x0, y0, x1, y1))
      }
    }
  }.asInstanceOf[Array[Long]])
  val stCellRing: UserDefinedFunction = udf((cell: Long, k: Int) => Cells.ring(cell, k))
  val stCellDisk: UserDefinedFunction = udf((cell: Long, k: Int) => Cells.disk(cell, k))
  val stCellParent: UserDefinedFunction = udf((cell: Long, res: Int) => Cells.parentAt(cell, res))
  val stCellChildren: UserDefinedFunction = udf((cell: Long) => Cells.children(cell))
  val stCellRes: UserDefinedFunction = udf((cell: Long) => Cells.res(cell))
  val stCellX: UserDefinedFunction = udf((cell: Long) => Cells.ix(cell))
  val stCellY: UserDefinedFunction = udf((cell: Long) => Cells.iy(cell))
  val stCellCentroid: UserDefinedFunction = udf((cell: Long) => {
    val (x, y) = Cells.centroid(cell); w(G.point(x, y))
  })
  val stCellEnvelope: UserDefinedFunction = udf((cell: Long) => {
    val (x0, y0, x1, y1) = Cells.envelope(cell); w(G.bbox(x0, y0, x1, y1))
  })
  val stZ2: UserDefinedFunction = udf((b: Array[Byte]) => nn(b) { x =>
    val c = g(x).getCentroid; Cells.z2(c.getX, c.getY)
  }.asInstanceOf[java.lang.Long])
  val stXZ2: UserDefinedFunction = udf((b: Array[Byte], res: Int) => nn(b) { x =>
    val env = g(x).getEnvelopeInternal
    XZ2(res).index(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
  }.asInstanceOf[java.lang.Long])
  val stZ3Bin: UserDefinedFunction = udf((millis: Long, period: String) =>
    BinnedTime.toBinned(BinnedTime.period(period), millis).bin.toInt)
  val stZ3: UserDefinedFunction = udf((b: Array[Byte], millis: Long, period: String) => nn(b) { x =>
    val c = g(x).getCentroid
    Cells.z3(c.getX, c.getY, millis, BinnedTime.period(period))._2
  }.asInstanceOf[java.lang.Long])

  /** All (name, udf) registrations. Aliases match the reference's names.
    * Every entry carries its SQL name (`withName`), so Column-API and CQL
    * applications produce the same named ScalaUDFs the SQL parser does —
    * SpatialFilterRule / SpatialJoinRewrite match on `udfName`, so
    * anonymous udf values would silently lose index pushdown. */
  val all: Seq[(String, UserDefinedFunction)] = Seq[(String, UserDefinedFunction)](
    "st_geomFromWKT" -> stGeomFromWKT, "st_geomFromText" -> stGeomFromWKT,
    "st_geometryFromText" -> stGeomFromWKT, "st_geomFromWKB" -> stGeomFromWKB,
    "st_geomFromGeoJSON" -> stGeomFromGeoJSON,
    "st_makePoint" -> stMakePoint, "st_point" -> stMakePoint, "st_makePointM" -> stMakePointM,
    "st_makeBBOX" -> stMakeBBOX, "st_makeBox2D" -> stMakeBox2D,
    // st_polygon is the line->polygon CONSTRUCTOR, not a cast
    // (reference GeometricConstructorFunctions.scala:45)
    "st_makePolygon" -> stMakePolygon, "st_polygon" -> stMakePolygon,
    "st_makeLine" -> stMakeLine, "st_lineFromText" -> stLineFromText,
    "st_pointFromText" -> stPointFromText, "st_polygonFromText" -> stPolygonFromText,
    "st_pointFromWKB" -> stPointFromWKB,
    "st_geomFromGeoHash" -> stGeomFromGeoHash, "st_box2DFromGeoHash" -> stGeomFromGeoHash,
    "st_pointFromGeoHash" -> stPointFromGeoHash,
    "st_mLineFromText" -> stGeomFromWKT, "st_mPointFromText" -> stGeomFromWKT,
    "st_mPolyFromText" -> stGeomFromWKT,
    "st_boundary" -> stBoundary, "st_coordDim" -> stCoordDim, "st_dimension" -> stDimension,
    "st_envelope" -> stEnvelope, "st_exteriorRing" -> stExteriorRing,
    "st_geometryN" -> stGeometryN, "st_geometryType" -> stGeometryType,
    "st_interiorRingN" -> stInteriorRingN, "st_isClosed" -> stIsClosed,
    "st_isCollection" -> stIsCollection, "st_isEmpty" -> stIsEmpty, "st_isRing" -> stIsRing,
    "st_isSimple" -> stIsSimple, "st_isValid" -> stIsValid,
    "st_numGeometries" -> stNumGeometries, "st_numPoints" -> stNumPoints,
    "st_pointN" -> stPointN, "st_x" -> stX, "st_y" -> stY,
    "st_contains" -> stContains, "st_covers" -> stCovers, "st_crosses" -> stCrosses,
    "st_disjoint" -> stDisjoint, "st_equals" -> stEquals, "st_intersects" -> stIntersects,
    "st_overlaps" -> stOverlaps, "st_touches" -> stTouches, "st_within" -> stWithin,
    "st_relate" -> stRelate, "st_relateBool" -> stRelateBool, "st_translate" -> stTranslate,
    "st_convexHull" -> stConvexHull,
    "st_area" -> stArea, "st_centroid" -> stCentroid, "st_closestPoint" -> stClosestPoint,
    "st_distance" -> stDistance, "st_distanceSphere" -> stDistanceSphere,
    "st_distanceSpheroid" -> stDistanceSpheroid,
    "st_length" -> stLength, "st_lengthSphere" -> stLengthSphere,
    "st_lengthSpheroid" -> stLengthSpheroid,
    "st_aggregateDistanceSphere" -> stAggregateDistanceSphere,
    "st_aggregateDistanceSpheroid" -> stAggregateDistanceSpheroid,
    "st_buffer" -> stBuffer, "st_bufferPoint" -> stBufferPoint,
    "st_antimeridianSafeGeom" -> stAntimeridianSafeGeom, "st_idlSafeGeom" -> stAntimeridianSafeGeom,
    "st_intersection" -> stIntersection, "st_dwithin" -> stDWithin,
    "st_dwithinPlanar" -> stDWithinPlanar,
    "st_asBinary" -> stAsBinary, "st_asText" -> stAsText, "st_asGeoJSON" -> stAsGeoJSON,
    "st_asLatLonText" -> stAsLatLonText, "st_geoHash" -> stGeoHash,
    "st_castToPoint" -> stCastToPoint, "st_castToPolygon" -> stCastToPolygon,
    "st_castToLineString" -> stCastToLineString, "st_byteArray" -> stByteArray,
    "st_cell" -> stCell, "st_cellOfXY" -> stCellOfXY, "st_cellCover" -> stCellCover,
    "st_cellRing" -> stCellRing, "st_cellDisk" -> stCellDisk,
    "st_cellParent" -> stCellParent, "st_cellChildren" -> stCellChildren,
    "st_cellRes" -> stCellRes, "st_cellX" -> stCellX, "st_cellY" -> stCellY,
    "st_cellCentroid" -> stCellCentroid,
    "st_cellEnvelope" -> stCellEnvelope,
    "st_z2" -> stZ2, "st_xz2" -> stXZ2, "st_z3" -> stZ3, "st_z3bin" -> stZ3Bin,
  ).map { case (n, f) => n -> f.withName(n) }

  private lazy val byName: Map[String, UserDefinedFunction] =
    all.map { case (n, f) => n.toLowerCase -> f }.toMap

  /** The NAMED udf for a SQL function name — use this (not the raw vals)
    * wherever the resulting predicate should be recognizable by the
    * injected optimizer rules. */
  def fn(name: String): UserDefinedFunction = byName(name.toLowerCase)

  /** Register every function on the session (the analog of the reference's
    * SQLTypes.init, GeoMesaSparkSQL.scala:82). Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, f) => spark.udf.register(name, f) }

  // -- Column API (the analog of the reference's DataFrameFunctions) ----
  // named forms: predicates built here are visible to the injected
  // pushdown/join-rewrite rules (matched by udfName)
  object st {
    def geomFromWKT(c: Column): Column = fn("st_geomFromWKT")(c)
    def makePoint(x: Column, y: Column): Column = fn("st_makePoint")(x, y)
    def makeBBOX(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column = fn("st_makeBBOX")(xmin, ymin, xmax, ymax)
    def intersects(a: Column, b: Column): Column = fn("st_intersects")(a, b)
    def contains(a: Column, b: Column): Column = fn("st_contains")(a, b)
    def within(a: Column, b: Column): Column = fn("st_within")(a, b)
    def distance(a: Column, b: Column): Column = fn("st_distance")(a, b)
    def distanceSphere(a: Column, b: Column): Column = fn("st_distanceSphere")(a, b)
    def dwithin(a: Column, b: Column, m: Column): Column = fn("st_dwithin")(a, b, m)
    def centroid(c: Column): Column = stCentroid(c)
    def x(c: Column): Column = stX(c)
    def y(c: Column): Column = stY(c)
    def asText(c: Column): Column = stAsText(c)
    def cell(geomWkb: Column, res: Column): Column = stCell(geomWkb, res)
    def cellOfXY(lon: Column, lat: Column, res: Column): Column = stCellOfXY(lon, lat, res)
    def cellCover(geomWkb: Column, res: Column, maxCells: Column): Column = stCellCover(geomWkb, res, maxCells)
    def cellRing(cell: Column, k: Column): Column = stCellRing(cell, k)
    def cellDisk(cell: Column, k: Column): Column = stCellDisk(cell, k)
    def geoHash(geomWkb: Column, bits: Column): Column = stGeoHash(geomWkb, bits)
  }
}
