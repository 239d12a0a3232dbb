package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.geom.GeomOps

/**
 * DE-9IM truth table + function surface checks, porting the *assertions*
 * of the reference's SparkSQLSpatialRelationshipsTest fixture
 * (FIXTURES.md §3) against our own implementation.
 */
class StFunctionsSpec extends AnyFunSuite with SparkTest {

  private def df(rows: Seq[(String, String)], table: String): Unit = {
    import spark.implicits._
    val d = rows.toDF("name", "wkt")
      .selectExpr("name", "st_geomFromWKT(wkt) as geom")
    d.createOrReplaceTempView(table)
  }

  private def names(sql: String): Set[String] = {
    import spark.implicits._
    spark.sql(sql).as[String].collect().toSet
  }

  lazy val init: Unit = {
    df(Seq(
      "int" -> "POINT(5 5)", "edge" -> "POINT(0 5)",
      "corner" -> "POINT(0 0)", "ext" -> "POINT(-5 0)"), "points")
    df(Seq(
      "touches" -> "LINESTRING(0 0, 1 0)",
      "crosses" -> "LINESTRING(-1 0, 1 0)",
      "disjoint" -> "LINESTRING(1 1, 2 1)"), "lines")
    df(Seq(
      "int" -> "POLYGON((2 2, 2 3, 3 3, 3 2, 2 2))",
      "intEdge" -> "POLYGON((0 2, 0 3, 1 3, 1 2, 0 2))",
      "overlap" -> "POLYGON((-1 2, -1 3, 1 3, 1 2, -1 2))",
      "extEdge" -> "POLYGON((-1 2, -1 3, 0 3, 0 2, -1 2))",
      "ext" -> "POLYGON((-2 2, -2 3, -1 3, -1 2, -2 2))",
      "corner" -> "POLYGON((-1 -1, -1 0, 0 0, 0 -1, -1 -1))"), "boxes")
  }

  val boxRef = "st_geomFromWKT('POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))')"
  val pointRef = "st_geomFromWKT('POINT(0 0)')"
  val lineRef = "st_geomFromWKT('LINESTRING(0 10, 0 -10)')"

  test("st_contains truth table (box vs points/boxes)") {
    init
    assert(names(s"select name from points where st_contains($boxRef, geom)") == Set("int"))
    assert(names(s"select name from boxes where st_contains($boxRef, geom)") == Set("int", "intEdge"))
  }

  test("st_covers truth table") {
    init
    assert(names(s"select name from points where st_covers($boxRef, geom)") == Set("int", "edge", "corner"))
    assert(names(s"select name from boxes where st_covers($boxRef, geom)") == Set("int", "intEdge"))
  }

  test("st_intersects truth table") {
    init
    assert(names(s"select name from points where st_intersects($boxRef, geom)") == Set("int", "edge", "corner"))
    assert(names(s"select name from lines where st_intersects($lineRef, geom)") == Set("touches", "crosses"))
    assert(names(s"select name from boxes where st_intersects($boxRef, geom)") ==
      Set("int", "intEdge", "overlap", "extEdge", "corner"))
  }

  test("st_disjoint is the complement of st_intersects") {
    init
    assert(names(s"select name from boxes where st_disjoint($boxRef, geom)") == Set("ext"))
  }

  test("st_crosses / st_touches / st_overlaps / st_within") {
    init
    assert(names(s"select name from lines where st_crosses($lineRef, geom)") == Set("crosses"))
    assert(names(s"select name from boxes where st_touches($boxRef, geom)") == Set("extEdge", "corner"))
    assert(names(s"select name from boxes where st_overlaps($boxRef, geom)") == Set("overlap"))
    assert(names(s"select name from points where st_within(geom, $boxRef)") == Set("int"))
  }

  test("st_equals and st_relate") {
    init
    val r = spark.sql(s"select st_equals($boxRef, st_geomFromWKT('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')) as e," +
      s" st_relate($pointRef, $lineRef) as im").head
    assert(r.getBoolean(0))
    assert(r.getString(1).length == 9)
    assert(spark.sql(s"select st_relateBool($boxRef, $boxRef, 'T*F**FFF*') as b").head.getBoolean(0))
  }

  test("st_convexhull: hull of a concave ring is its bounding triangle-free hull") {
    init
    // L-shaped polygon: hull vertices (0 0),(10 0),(10 5),(5 10),(0 10)
    // fill the cut corner -> area 100 - 12.5 = 87.5
    val r = spark.sql(
      """select st_area(st_convexhull(st_geomFromWKT(
        |  'POLYGON((0 0, 10 0, 10 5, 5 5, 5 10, 0 10, 0 0))'))) as a,
        |  st_asText(st_convexhull(st_geomFromWKT('MULTIPOINT((0 0),(4 0),(2 9),(2 3))'))) as h,
        |  st_convexhull(null) as n""".stripMargin).head
    assert(math.abs(r.getDouble(0) - 87.5) < 1e-9)
    assert(r.getString(1) == "POLYGON ((0 0, 2 9, 4 0, 0 0))" || r.getString(1) == "POLYGON ((0 0, 4 0, 2 9, 0 0))")
    assert(r.isNullAt(2))
  }

  test("constructors, accessors, outputs round-trip") {
    val r = spark.sql(
      """select st_asText(st_makePoint(1.5, 2.5)) as wkt,
        |  st_x(st_makePoint(1.5, 2.5)) as x,
        |  st_y(st_makePoint(1.5, 2.5)) as y,
        |  st_area(st_makeBBOX(0, 0, 2, 3)) as area,
        |  st_geometryType(st_makeBBOX(0,0,1,1)) as gt,
        |  st_numPoints(st_geomFromWKT('LINESTRING(0 0, 1 1, 2 2)')) as np,
        |  st_asGeoJSON(st_makePoint(1, 2)) as gj,
        |  st_isValid(st_makeBBOX(0,0,1,1)) as v,
        |  st_dimension(st_makeBBOX(0,0,1,1)) as dim
        |""".stripMargin).head
    assert(r.getString(0) == "POINT (1.5 2.5)")
    assert(r.getDouble(1) == 1.5 && r.getDouble(2) == 2.5)
    assert(r.getDouble(3) == 6.0)
    assert(r.getString(4) == "Polygon")
    assert(r.getInt(5) == 3)
    assert(r.getString(6) == """{"type":"Point","coordinates":[1,2]}""")
    assert(r.getBoolean(7))
    assert(r.getInt(8) == 2)
  }

  test("null propagation") {
    val r = spark.sql("select st_intersects(null, st_makePoint(0,0)) as a, st_asText(null) as b").head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("geohash encode/decode round-trip") {
    val r = spark.sql("select st_geoHash(st_makePoint(-77.0365, 38.8977), 40) as h").head
    val hash = r.getString(0)
    assert(hash.length == 8)
    val (x0, y0, x1, y1) = GeomOps.geohashBBox(hash)
    assert(-77.0365 >= x0 && -77.0365 <= x1 && 38.8977 >= y0 && 38.8977 <= y1)
  }

  test("st_distanceSphere haversine sanity (1 deg lon at equator ~111 km)") {
    val d = spark.sql("select st_distanceSphere(st_makePoint(0,0), st_makePoint(1,0)) as d").head.getDouble(0)
    assert(math.abs(d - 111195.0) < 200.0)
  }

  test("st_distanceSpheroid: WGS84 Vincenty against published geodesic fixtures (<1 m)") {
    // closed forms: 1 deg of equator = 2*pi*a/360; quarter meridian
    // (WGS84) = 10,001,965.729 m; JFK-LHR from the same formula run
    // through an independent implementation
    val eq = GeomOps.vincentyMeters(0, 0, 1, 0)
    assert(math.abs(eq - 111319.4908) < 0.001, s"equator degree: $eq")
    val qm = GeomOps.vincentyMeters(0, 0, 0, 90)
    assert(math.abs(qm - 10001965.729) < 0.01, s"quarter meridian: $qm")
    val jfkLhr = GeomOps.vincentyMeters(-73.7789, 40.6397, -0.4543, 51.4700)
    assert(math.abs(jfkLhr - 5555072.558) < 1.0, s"JFK-LHR: $jfkLhr")
    // spheroid differs from the sphere (meridian degree is shorter than
    // the haversine mean-radius degree) — the names must NOT be aliases
    val merSpheroid = GeomOps.vincentyMeters(0, 0, 0, 1)
    val merSphere = GeomOps.haversineMeters(0, 0, 0, 1)
    assert(math.abs(merSpheroid - 110574.3886) < 0.001, s"meridian degree: $merSpheroid")
    assert(math.abs(merSpheroid - merSphere) > 500, "spheroid must not equal sphere")
    // symmetric + zero + SQL surface
    assert(GeomOps.vincentyMeters(10, 20, 10, 20) == 0.0)
    assert(math.abs(GeomOps.vincentyMeters(5, 10, 25, 40) - GeomOps.vincentyMeters(25, 40, 5, 10)) < 1e-6)
    val viaSql = spark.sql(
      "select st_distanceSpheroid(st_makePoint(-73.7789, 40.6397), st_makePoint(-0.4543, 51.47)) as d")
      .head.getDouble(0)
    assert(math.abs(viaSql - jfkLhr) < 1e-6)
    // antipodal fallback does not blow up
    val anti = GeomOps.vincentyMeters(0, 0, 179.7, 0.5)
    assert(anti > 1.9e7 && anti < 2.1e7)
  }

  test("cell functions: assignment, ring, cover, parent") {
    val r = spark.sql(
      """select st_cellOfXY(10.0, 45.0, 9) as c,
        |  st_cell(st_makePoint(10.0, 45.0), 9) as c2,
        |  size(st_cellRing(st_cellOfXY(10.0, 45.0, 9), 1)) as ring,
        |  size(st_cellCover(st_makeBBOX(9.9, 44.9, 10.1, 45.1), 9, 1024)) as cov,
        |  st_cellRes(st_cellParent(st_cellOfXY(10.0, 45.0, 9), 7)) as pres
        |""".stripMargin).head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getInt(2) == 8)
    assert(r.getInt(3) >= 1)
    assert(r.getInt(4) == 7)
  }

  test("st_dwithin + st_bufferPoint behave consistently") {
    val r = spark.sql(
      """select st_dwithin(st_makePoint(0,0), st_makePoint(0.5,0), 60000) as near,
        |  st_dwithin(st_makePoint(0,0), st_makePoint(0.5,0), 50000) as far,
        |  st_contains(st_bufferPoint(st_makePoint(0,0), 60000), st_makePoint(0.5, 0)) as inBuf
        |""".stripMargin).head
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
  }

  test("st_antimeridianSafeGeom splits dateline-crossing boxes") {
    val r = spark.sql("select st_numGeometries(st_antimeridianSafeGeom(st_makeBBOX(170, 0, 190, 10))) as n").head
    assert(r.getInt(0) == 2)
  }
}
