package graft.functions

import org.locationtech.jts.geom.Geometry
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.geom.GeomOps

/**
 * Ports the reference's OWN function-test assertions — the concrete
 * inputs and expected outputs of geomesa-spark-jts's udf test suites —
 * and runs them through our SQL registrations:
 *
 *  - GeometricConstructorFunctionsTest.scala (31-426)
 *  - GeometricAccessorFunctionsTest.scala (31-726)
 *  - GeometricCastFunctionsTest.scala (30-87)
 *  - GeometricOutputFunctionsTest.scala (31-194)
 *  - GeometricProcessingFunctionsTest.scala (32-83)
 *  - SpatialRelationFunctionsTest.scala (440-503, the scalar cases the
 *    DE-9IM truth table in StFunctionsSpec doesn't already carry)
 *
 * Geometry equality is JTS equalsExact on the parsed WKB (the reference
 * compares JTS geometries directly; our column representation is WKB).
 */
class ReferenceParitySpec extends AnyFunSuite with SparkTest {

  lazy val init: Unit = StFunctions.register(spark)

  private def geomOf(expr: String): Geometry = {
    init
    GeomOps.fromWkb(spark.sql(s"select $expr").head.getAs[Array[Byte]](0))
  }
  private def row(expr: String) = { init; spark.sql(s"select $expr").head }
  private def isNull(expr: String): Boolean = row(expr).isNullAt(0)
  // normalized comparison: same coordinates, canonical ring order/start.
  // The reference's expected WKTs bake in JTS 1.14's envelope vertex
  // order; JTS 1.20 (ours) emits the same ring rotated/reversed.
  private def geomEq(expr: String, wkt: String): Unit = {
    val got = geomOf(expr)
    assert(got.norm().equalsExact(GeomOps.fromWkt(wkt).norm()),
      s"$expr -> ${GeomOps.toWkt(got)} != $wkt")
  }

  // ---- constructors (GeometricConstructorFunctionsTest) --------------

  test("st_geomFromGeoHash / st_box2DFromGeoHash / st_pointFromGeoHash: 'ezs42' @ 25 bits") {
    // reference :31-105 — box (-5.625, 42.583) .. (-5.581, 42.627) ± .022
    for (fn <- Seq("st_geomFromGeoHash", "st_box2DFromGeoHash")) {
      val env = geomOf(s"$fn('ezs42', 25)").getEnvelopeInternal
      assert(geomOf(s"$fn('ezs42', 25)").getCoordinates.length == 5)
      assert(math.abs(env.getMinX - -5.625) < .022 && math.abs(env.getMinY - 42.583) < .022)
      assert(math.abs(env.getMaxX - -5.581) < .022 && math.abs(env.getMaxY - 42.627) < .022)
      assert(isNull(s"$fn(null, null)"))
    }
    val p = geomOf("st_pointFromGeoHash('ezs42', 25)")
    assert(math.abs(p.getCoordinate.x - -5.603) < .022 && math.abs(p.getCoordinate.y - 42.605) < .022)
    assert(isNull("st_pointFromGeoHash(null, null)"))
    // empty hash (zero decodable bits) = the whole world, not an error
    val world = geomOf("st_geomFromGeoHash('', 0)").getEnvelopeInternal
    assert(world.getMinX == -180 && world.getMaxX == 180 &&
      world.getMinY == -90 && world.getMaxY == 90)
    assert(geomOf("st_pointFromGeoHash('', 0)").getCoordinate.x == 0)
  }

  test("text constructors: geomFromWKT/geometryFromText/lineFromText/pointFromText/mLine/mPoint/mPoly/polygonFromText") {
    // reference :107-135, 161-174, 278-322, 338-351, 389-403
    geomEq("st_geomFromWKT('POINT(0 0)')", "POINT(0 0)")
    geomEq("st_geometryFromText('POINT(0 0)')", "POINT(0 0)")
    geomEq("st_lineFromText('LINESTRING(0 0, 1 1, 2 2)')", "LINESTRING(0 0, 1 1, 2 2)")
    geomEq("st_pointFromText('Point(0 0)')", "POINT(0 0)")
    geomEq("st_mLineFromText('MULTILINESTRING((0 0, 1 1, 2 2), (0 1, 1 2, 2 3))')",
      "MULTILINESTRING((0 0, 1 1, 2 2), (0 1, 1 2, 2 3))")
    geomEq("st_mPointFromText('MULTIPOINT((0 0), (1 1))')", "MULTIPOINT((0 0), (1 1))")
    val mpoly = "MULTIPOLYGON((( -1 -1, 0 1, 1 -1, -1 -1 )),((-4 4, 4 4, 4 -4, -4 -4, -4 4), (2 2, -2 2, -2 -2, 2 -2, 2 2)))"
    geomEq(s"st_mPolyFromText('$mpoly')", mpoly)
    geomEq("st_polygonFromText('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))')",
      "POLYGON((0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 2.0, 0.0 0.0))")
    for (fn <- Seq("st_geomFromWKT", "st_geometryFromText", "st_lineFromText",
                   "st_pointFromText", "st_mLineFromText", "st_mPointFromText",
                   "st_mPolyFromText", "st_polygonFromText"))
      assert(isNull(s"$fn(null)"), fn)
  }

  test("st_geomFromWKB / st_pointFromWKB round the WKB writer's bytes back") {
    // reference :137-159, 353-368 (byte-literal input; we produce the
    // same bytes with st_asBinary, asserted byte-exact in the output test)
    geomEq("st_geomFromWKB(st_asBinary(st_geomFromWKT('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))')))",
      "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    geomEq("st_pointFromWKB(st_asBinary(st_makePoint(0, 0)))", "POINT(0 0)")
    assert(isNull("st_geomFromWKB(null)") && isNull("st_pointFromWKB(null)"))
  }

  test("st_makeBBOX / st_makeBox2D / st_makePolygon / st_polygon / st_makePoint / st_point / st_makePointM / st_makeLine") {
    // reference :176-276, 324-336, 370-387
    geomEq("st_makeBBOX(0.0, 0.0, 2.0, 2.0)", "POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    geomEq("st_makeBox2D(st_castToPoint(st_geomFromWKT('POINT(0 0)')), st_castToPoint(st_geomFromWKT('POINT(2 2)')))",
      "POLYGON((0.0 0.0, 0.0 2.0, 2.0 2.0, 2.0 0.0, 0.0 0.0))")
    geomEq("st_makePolygon(st_castToLineString(st_geomFromWKT('LINESTRING(0 0, 2 2, 5 4, 7 2, 5 2, 3 0, 0 0)')))",
      "POLYGON((0 0, 2 2, 5 4, 7 2, 5 2, 3 0, 0 0))")
    geomEq("st_polygon(st_castToLineString(st_geomFromWKT('LINESTRING(0 0, 2 2, 5 2, 3 0, 0 0)')))",
      "POLYGON((0 0, 2 2, 5 2, 3 0, 0 0))")
    geomEq("st_makePoint(0, 0)", "POINT(0 0)")
    geomEq("st_point(0, 0)", "POINT(0 0)")
    // the M point equals POINT(0 0) in XY and carries m as z in the WKB
    geomEq("st_makePointM(0, 0, 1)", "POINT(0 0)")
    assert(geomOf("st_makePointM(0, 0, 1)").getCoordinate.getZ == 1.0)
    geomEq("st_makeLine(array(st_makePoint(0,0), st_makePoint(2,2), st_makePoint(5,2)))",
      "LINESTRING(0 0, 2 2, 5 2)")
    for (e <- Seq("st_makeBBOX(null, null, null, null)", "st_makeBox2D(null, null)",
                  "st_makePolygon(null)", "st_polygon(null)", "st_makePoint(null, null)",
                  "st_point(null, null)", "st_makePointM(null, null, null)", "st_makeLine(null)"))
      assert(isNull(e), e)
  }

  // ---- accessors (GeometricAccessorFunctionsTest) ---------------------

  test("st_boundary / st_coordDim / st_dimension") {
    // reference :31-110
    geomEq("st_boundary(st_geomFromWKT('LINESTRING(1 1, 0 0, -1 1)'))", "MULTIPOINT(1 1, -1 1)")
    assert(row("st_coordDim(st_geomFromWKT('POINT(0 0)'))").getInt(0) == 2)
    assert(row("st_dimension(st_geomFromWKT('POINT(0 0)'))").getInt(0) == 0)
    assert(row("st_dimension(st_geomFromWKT('LINESTRING(1 1, 0 0, -1 1)'))").getInt(0) == 1)
    assert(row("st_dimension(st_geomFromWKT('POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))'))").getInt(0) == 2)
    assert(row("st_dimension(st_geomFromWKT('GEOMETRYCOLLECTION(LINESTRING(1 1,0 0),POINT(0 0))'))").getInt(0) == 1)
    assert(isNull("st_boundary(null)") && isNull("st_coordDim(null)") && isNull("st_dimension(null)"))
  }

  test("st_envelope: point stays point, line/poly produce envelope polygons") {
    // reference :112-151
    geomEq("st_envelope(st_geomFromWKT('POINT(0 0)'))", "POINT(0 0)")
    geomEq("st_envelope(st_geomFromWKT('LINESTRING(0 0, 1 3)'))", "POLYGON((0 0,1 0,1 3,0 3,0 0))")
    geomEq("st_envelope(st_geomFromWKT('POLYGON((0 0, 0 1, 1.0000001 1, 1.0000001 0, 0 0))'))",
      "POLYGON((0 0, 1.0000001 0, 1.0000001 1, 0 1, 0 0))")
    assert(isNull("st_envelope(null)"))
  }

  test("st_exteriorRing / st_interiorRingN: rings for polygons, null otherwise") {
    // reference :153-192, 275-313
    assert(isNull("st_exteriorRing(st_geomFromWKT('POINT(0 0)'))"))
    geomEq("st_exteriorRing(st_geomFromWKT('POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))'))",
      "LINESTRING(30 10, 40 40, 20 40, 10 20, 30 10)")
    geomEq("st_exteriorRing(st_geomFromWKT('POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))'))",
      "LINESTRING(35 10, 45 45, 15 40, 10 20, 35 10)")
    assert(isNull("st_interiorRingN(st_geomFromWKT('POINT(0 0)'), 1)"))
    geomEq("st_interiorRingN(st_geomFromWKT('POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10),(20 30, 35 35, 30 20, 20 30))'), 1)",
      "LINESTRING(20 30, 35 35, 30 20, 20 30)")
    assert(isNull("st_interiorRingN(st_geomFromWKT('POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))'), 5)"))
    assert(isNull("st_exteriorRing(null)") && isNull("st_interiorRingN(null, null)"))
  }

  test("st_geometryN is 1-based; st_geometryType names") {
    // reference :194-273
    geomEq("st_geometryN(st_geomFromWKT('POINT(0 0)'), 1)", "POINT(0 0)")
    geomEq("st_geometryN(st_geomFromWKT('MULTILINESTRING ((10 10, 20 20, 10 40),(40 40, 30 30, 40 20, 30 10))'), 1)",
      "LINESTRING(10 10, 20 20, 10 40)")
    geomEq("st_geometryN(st_geomFromWKT('GEOMETRYCOLLECTION(LINESTRING(1 1,0 0),POINT(0 0))'), 1)",
      "LINESTRING(1 1,0 0)")
    assert(row("st_geometryType(st_geomFromWKT('POINT(0 0)'))").getString(0) == "Point")
    assert(row("st_geometryType(st_geomFromWKT('LINESTRING(0 0, 1 3)'))").getString(0) == "LineString")
    assert(row("st_geometryType(st_geomFromWKT('GEOMETRYCOLLECTION(LINESTRING(1 1,0 0),POINT(0 0))'))").getString(0) == "GeometryCollection")
    assert(isNull("st_geometryN(null, null)") && isNull("st_geometryType(null)"))
  }

  test("st_isClosed: lines AND multilines; non-lines are closed") {
    // reference :315-364 — the multiline cases need component-wise closure
    def b(expr: String) = row(expr).getBoolean(0)
    assert(!b("st_isClosed(st_geomFromWKT('LINESTRING(0 0, 1 1)'))"))
    assert(b("st_isClosed(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 0 0)'))"))
    assert(!b("st_isClosed(st_geomFromWKT('MULTILINESTRING((0 0, 0 1, 1 1, 0 0),(0 0, 1 1))'))"))
    assert(b("st_isClosed(st_geomFromWKT('MULTILINESTRING((0 0, 0 1, 1 1, 0 0),(0 0, 1 1, 0 0))'))"))
    assert(isNull("st_isClosed(null)"))
  }

  test("st_isCollection / st_isEmpty / st_isRing / st_isSimple / st_isValid") {
    // reference :366-537
    def b(expr: String) = row(expr).getBoolean(0)
    assert(!b("st_isCollection(st_geomFromWKT('POINT(0 0)'))"))
    assert(b("st_isCollection(st_geomFromWKT('MULTIPOINT((0 0), (42 42))'))"))
    assert(b("st_isCollection(st_geomFromWKT('GEOMETRYCOLLECTION(POINT(0 0))'))"))
    assert(b("st_isEmpty(st_geomFromWKT('GEOMETRYCOLLECTION EMPTY'))"))
    assert(!b("st_isEmpty(st_geomFromWKT('POINT(0 0)'))"))
    assert(b("st_isRing(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)'))"))
    assert(!b("st_isRing(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 0, 1 1, 0 0)'))"))
    assert(b("st_isSimple(st_geomFromWKT('POINT(0 0)'))"))
    assert(b("st_isSimple(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)'))"))
    assert(!b("st_isSimple(st_geomFromWKT('LINESTRING(1 1,2 2,2 3.5,1 3,1 2,2 1)'))"))
    assert(!b("st_isSimple(st_geomFromWKT('POLYGON((1 2, 3 4, 5 6, 1 2))'))"))
    assert(b("st_isValid(st_geomFromWKT('LINESTRING(0 0, 1 1)'))"))
    assert(!b("st_isValid(st_geomFromWKT('POLYGON((0 0, 1 1, 1 2, 1 1, 0 0))'))"))
    for (fn <- Seq("st_isCollection", "st_isEmpty", "st_isRing", "st_isSimple", "st_isValid"))
      assert(isNull(s"$fn(null)"), fn)
  }

  test("st_numGeometries / st_numPoints / st_pointN (incl. negative index) / st_x / st_y") {
    // reference :539-726
    assert(row("st_numGeometries(st_geomFromWKT('POINT(0 0)'))").getInt(0) == 1)
    assert(row("st_numGeometries(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)'))").getInt(0) == 1)
    assert(row("st_numGeometries(st_geomFromWKT('GEOMETRYCOLLECTION(MULTIPOINT(-2 3,-2 2), LINESTRING(5 5,10 10), POLYGON((-7 4.2,-7.1 5,-7.1 4.3,-7 4.2)))'))").getInt(0) == 3)
    assert(row("st_numPoints(st_geomFromWKT('POINT(0 0)'))").getInt(0) == 1)
    assert(row("st_numPoints(st_geomFromWKT('MULTIPOINT(-2 3,-2 2)'))").getInt(0) == 2)
    assert(row("st_numPoints(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)'))").getInt(0) == 5)
    val line = "st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 1 0, 0 2)')"
    geomEq(s"st_pointN($line, 1)", "POINT(0 0)")
    geomEq(s"st_pointN($line, 5)", "POINT(0 2)")
    geomEq(s"st_pointN($line, -5)", "POINT(0 0)")
    geomEq(s"st_pointN($line, -1)", "POINT(0 2)")
    assert(row("st_x(st_geomFromWKT('POINT(0 1)'))").getDouble(0) == 0.0)
    assert(row("st_y(st_geomFromWKT('POINT(0 1)'))").getDouble(0) == 1.0)
    assert(isNull("st_x(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)'))"))
    assert(isNull("st_y(st_geomFromWKT('LINESTRING(0 0, 0 1, 1 1, 1 0, 0 0)'))"))
    for (e <- Seq("st_numGeometries(null)", "st_numPoints(null)", "st_pointN(null, null)",
                  "st_x(null)", "st_y(null)"))
      assert(isNull(e), e)
  }

  // ---- casts (GeometricCastFunctionsTest) -----------------------------

  test("casts preserve the geometry; st_byteArray encodes UTF-8") {
    // reference :30-87
    geomEq("st_castToPoint(st_geomFromWKT('POINT(1 1)'))", "POINT(1 1)")
    geomEq("st_castToPolygon(st_geomFromWKT('POLYGON((1 1, 1 2, 2 2, 2 1, 1 1))'))",
      "POLYGON((1 1, 1 2, 2 2, 2 1, 1 1))")
    geomEq("st_castToLineString(st_geomFromWKT('LINESTRING(1 1, 2 2)'))", "LINESTRING(1 1, 2 2)")
    assert(row("st_byteArray('foo')").getAs[Array[Byte]](0).toSeq == "foo".getBytes("UTF-8").toSeq)
    for (fn <- Seq("st_castToPoint", "st_castToPolygon", "st_castToLineString", "st_byteArray"))
      assert(isNull(s"$fn(null)"), fn)
  }

  // ---- outputs (GeometricOutputFunctionsTest) -------------------------

  test("st_asBinary emits the reference's exact big-endian 2D WKB bytes") {
    // reference :31-49
    val expected = Array[Byte](0, 0, 0, 0, 3, 0, 0, 0, 1, 0, 0, 0, 5, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 64, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 64, 0, 0, 0, 0, 0, 0, 0,
      64, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 64, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0)
    val got = row("st_asBinary(st_geomFromWKT('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))'))").getAs[Array[Byte]](0)
    assert(got.toSeq == expected.toSeq)
    assert(isNull("st_asBinary(null)"))
  }

  test("st_asGeoJSON round-trips every geometry type through the GeoJSON reader") {
    // reference :51-147 asserts exact strings from GeoTools' writer whose
    // number formatting ("[0.0,0.0]" vs "[0,0]") is not normative; parity
    // here is semantic — the JSON parses back to the identical geometry
    init
    val wkts = Seq(
      "POINT(0 0)",
      "LINESTRING(0 0, 1 1, 2 2)",
      "POLYGON((0.45 0.75, 1.15 0.75, 1.15 1.45, 0.45 1.45, 0.45 0.75))",
      "MULTIPOINT((0 0), (1 1))",
      "MULTILINESTRING((0 0, 1 1, 2 2), (-3 -3, -2 -2, -1 -1))",
      "MULTIPOLYGON(((0.45 0.75, 1.15 0.75, 1.15 1.45, 0.45 1.45, 0.45 0.75)),((0 0, 1 0, 1 1, 0 1, 0 0)))",
      "GEOMETRYCOLLECTION(POINT(0 0), LINESTRING(0 0, 1 1, 2 2))")
    for (wkt <- wkts) {
      val json = spark.sql(s"select st_asGeoJSON(st_geomFromWKT('$wkt'))").head.getString(0)
      assert(graft.geom.GeoJson.read(json).equalsExact(GeomOps.fromWkt(wkt)), wkt)
    }
    assert(isNull("st_asGeoJSON(null)"))
  }

  test("st_asLatLonText matches the reference byte-for-byte (floor-degree semantics)") {
    // reference :149-157 — note 77°30'W for lon -76.5: degrees are FLOORED
    assert(row("st_asLatLonText(st_makePoint(-76.5, 38.5))").getString(0) ==
      """38°30'0.000"N 77°30'0.000"W""")
    assert(isNull("st_asLatLonText(null)"))
  }

  test("st_asText / st_geoHash") {
    // reference :159-194
    assert(row("st_asText(st_geomFromWKT('POINT (-76.5 38.5)'))").getString(0) == "POINT (-76.5 38.5)")
    assert(row("st_geoHash(st_geomFromWKT('POINT (-76.5 38.5)'), 25)").getString(0) == "dqce5")
    assert(isNull("st_asText(null)") && isNull("st_geoHash(null, null)"))
  }

  // ---- processing (GeometricProcessingFunctionsTest) ------------------

  test("st_bufferPoint buffers in meters; antimeridian-crossing buffers wrap") {
    // reference :32-61 (semantic form: the reference asserts a fixed
    // 100-vertex ring; we assert the meter radius it encodes)
    init
    def contains(buf: String, pt: String): Boolean =
      spark.sql(s"select st_contains($buf, $pt)").head.getBoolean(0)
    val buf = "st_bufferPoint(st_makePoint(0,0), 10)"
    assert(contains(buf, "st_makePoint(0.00008, 0)"))   // ~8.9 m inside
    assert(!contains(buf, "st_makePoint(0.00011, 0)"))  // ~12.2 m outside
    val am = "st_bufferPoint(st_makePoint(-180, 50), 100000)"
    assert(contains(am, "st_makePoint(-179.9, 50)"))
    assert(contains(am, "st_makePoint(179.9, 50)"))
    assert(isNull("st_bufferPoint(null, null)"))
  }

  test("dateline rule splits FilterHelperTest's wide IDL polygon into the reference's exact halves") {
    // FilterHelperTest.scala:96-98 ("fix IDL polygons in intersects"):
    // a polygon spanning more than 180 degrees of longitude is
    // interpreted as crossing the antimeridian and split at +-180
    val got = GeomOps.antimeridianSafe(
      GeomOps.fromWkt("POLYGON((-150 23,-164 11,45 23,49 30,-150 23))"))
    assert(got.getNumGeometries == 2, GeomOps.toWkt(got))
    val parts = (0 until 2).map(got.getGeometryN).sortBy(_.getEnvelopeInternal.getMinX)
    val west = GeomOps.fromWkt("POLYGON ((-180 12.271523178807946, -180 24.304347826086957, " +
      "-150 23, -164 11, -180 12.271523178807946))")
    val east = GeomOps.fromWkt("POLYGON ((180 24.304347826086957, 180 12.271523178807946, " +
      "45 23, 49 30, 180 24.304347826086957))")
    assert(parts(0).norm().equalsExact(west.norm(), 1e-9), GeomOps.toWkt(parts(0)))
    assert(parts(1).norm().equalsExact(east.norm(), 1e-9), GeomOps.toWkt(parts(1)))
    // idempotent (FilterHelperTest "be idempotent with intersects"):
    // re-normalizing the split parts changes nothing
    val again = GeomOps.antimeridianSafe(got)
    assert(again.norm().equalsExact(got.norm(), 1e-9), GeomOps.toWkt(again))
    // valid geometries pass through unchanged ("not modify valid intersects")
    val valid = GeomOps.fromWkt("POLYGON((45 23, 45 27, 48 27, 48 23, 45 23))")
    assert(GeomOps.antimeridianSafe(valid).equalsExact(valid))
    // empty geometries pass through, not crash (regression: empty rings
    // have no coordinates to unwrap)
    assert(GeomOps.antimeridianSafe(GeomOps.fromWkt("POLYGON EMPTY")).isEmpty)
    assert(GeomOps.antimeridianSafe(GeomOps.fromWkt(
      "GEOMETRYCOLLECTION (POLYGON EMPTY, POINT (1 2))")).getNumGeometries == 2)
  }

  test("st_antimeridianSafeGeom splits the reference's test polygon into its exact halves") {
    // reference :64-82
    val got = geomOf("st_antimeridianSafeGeom(st_geomFromWKT('POLYGON((-190 50, -190 60, -170 60, -170 50, -190 50))'))")
    val expected = GeomOps.fromWkt(
      "MULTIPOLYGON (((-180 50, -180 60, -170 60, -170 50, -180 50)), ((180 60, 180 50, 170 50, 170 60, 180 60)))")
    assert(got.norm().equalsExact(expected.norm()), GeomOps.toWkt(got))
    assert(isNull("st_antimeridianSafeGeom(null)"))
  }

  // ---- scalar relations (SpatialRelationFunctionsTest :440-503) -------

  test("spheroid distances over the chicago fixture match the reference's exact doubles") {
    // SparkSQLGeometricDistanceFunctionsTest.scala:42-86 over the
    // ingestChicago points (-76.5 38.5), (-77 38), (-78 39): windowed
    // st_aggregateDistanceSpheroid / st_lengthSpheroid pair distances
    // 70681.00230533161 and 141178.0595870766 meters (GeoTools WGS84
    // orthodromic; ours is Vincenty — agree to < 1 mm)
    init
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val chicago = Seq(
      (1, "2016-01-01T00:00:00Z", -76.5, 38.5),
      (2, "2016-01-02T00:00:00Z", -77.0, 38.0),
      (3, "2016-01-03T00:00:00Z", -78.0, 39.0))
      .toDF("case_number", "dtgs", "x", "y")
      .selectExpr("case_number", "to_timestamp(dtgs) as dtg", "st_makePoint(x, y) as geom")
    chicago.createOrReplaceTempView("chicago")
    val q =
      """select case_number, st_aggregateDistanceSpheroid(l) as agg,
        |       st_lengthSpheroid(st_makeLine(l)) as len
        |from (
        |  select case_number, dtg,
        |    collect_list(geom) OVER (PARTITION BY true ORDER BY dtg asc
        |                             ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) as l
        |  from chicago)
        |where size(l) > 1 order by case_number""".stripMargin
    val rows = spark.sql(q).collect()
    val expected = Array(70681.00230533161, 141178.0595870766)
    rows.map(_.getAs[Double]("agg")).zip(expected).foreach { case (got, e) =>
      assert(math.abs(got - e) < 0.001, s"agg $got vs $e") }
    rows.map(_.getAs[Double]("len")).zip(expected).foreach { case (got, e) =>
      assert(math.abs(got - e) < 0.001, s"len $got vs $e") }
  }

  test("st_closestPoint / st_distance / st_distanceSphere / st_length / st_translate") {
    geomEq("st_closestPoint(st_geomFromWKT('POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))'), st_geomFromWKT('POINT(15 5)'))",
      "POINT(10 5)")
    assert(row("st_distance(st_makePoint(0,0), st_makePoint(10,0))").getDouble(0) == 10.0)
    assert(math.abs(row("st_distanceSphere(st_makePoint(0,0), st_makePoint(10,0))").getDouble(0) - 1111950.0) < 1.0)
    assert(row("st_length(st_geomFromWKT('LINESTRING(0 0, 10 0)'))").getDouble(0) == 10.0)
    assert(row("st_length(st_geomFromWKT('POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))'))").getDouble(0) == 40.0)
    geomEq("st_translate(st_geomFromWKT('LINESTRING(0 0, 10 0)'), 1, 2)", "LINESTRING(1 2, 11 2)")
    for (e <- Seq("st_closestPoint(null, null)", "st_distance(null, null)",
                  "st_distanceSphere(null, null)", "st_length(null)"))
      assert(isNull(e), e)
  }
}
