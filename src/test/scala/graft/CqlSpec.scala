package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.plans.Cql
import graft.functions.StFunctions

/**
 * CQL filter compiler vs hand-written Column predicates — the cases
 * mirror the filter strings the reference's own tests feed
 * ECQL.toFilter (geomesa-accumulo/-index test suites).
 */
class CqlSpec extends AnyFunSuite with Matchers with SparkTest {

  import spark.implicits._

  private lazy val people: DataFrame = Seq(
    (1L, "Addams", 15, 10.5, "2014-01-05T10:00:00Z", 0.0, 0.0, "a%b"),
    (2L, "Bierce", 25, 20.0, "2014-02-02T12:00:00Z", 10.0, 10.0, "axb"),
    (3L, "Clemens", 35, 30.5, "2014-03-10T00:00:00Z", 45.0, 45.0, "zzz"),
    (4L, "doyle", 45, 0.0, "2014-06-07T12:30:00Z", -45.0, -45.0, "AXB")
  ).toDF("id", "name", "age", "score", "dtgs", "lon", "lat", "s")
    .withColumn("dtg", to_timestamp(col("dtgs")))
    .withColumn("geom", StFunctions.stMakePoint(col("lon"), col("lat")))

  private def ids(df: DataFrame, cql: String): Set[Long] =
    Cql.filter(df, cql).select("id").as[Long].collect().toSet

  test("INCLUDE / EXCLUDE") {
    ids(people, "INCLUDE") shouldBe Set(1L, 2L, 3L, 4L)
    ids(people, "EXCLUDE") shouldBe Set.empty
  }

  test("comparisons, case-insensitive keywords, arithmetic") {
    ids(people, "age = 15") shouldBe Set(1L)
    ids(people, "age <> 15") shouldBe Set(2L, 3L, 4L)
    ids(people, "age != 15") shouldBe Set(2L, 3L, 4L)
    ids(people, "age<29") shouldBe Set(1L, 2L)
    ids(people, "age >= 35") shouldBe Set(3L, 4L)
    ids(people, "name = 'Addams'") shouldBe Set(1L)
    ids(people, "age * 2 + 5 > 55") shouldBe Set(3L, 4L)
    ids(people, "(age + 5) / 2 >= 20") shouldBe Set(3L, 4L)
    ids(people, "score - age < 0") shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("AND / OR / NOT precedence and parens") {
    ids(people, "(age = 15) or (age = 25) or (age = 35)") shouldBe Set(1L, 2L, 3L)
    ids(people, "age > 10 AND age < 30") shouldBe Set(1L, 2L)
    // AND binds tighter than OR
    ids(people, "age = 15 OR age = 25 AND score = 20.0") shouldBe Set(1L, 2L)
    ids(people, "(age = 15 OR age = 25) AND score = 20.0") shouldBe Set(2L)
    ids(people, "NOT age = 15") shouldBe Set(2L, 3L, 4L)
    ids(people, "not (age = 15 or age = 25)") shouldBe Set(3L, 4L)
  }

  test("BETWEEN / IN / LIKE / ILIKE / IS NULL") {
    ids(people, "age BETWEEN 20 AND 40") shouldBe Set(2L, 3L)
    ids(people, "age NOT BETWEEN 20 AND 40") shouldBe Set(1L, 4L)
    ids(people, "age in (15, 45)") shouldBe Set(1L, 4L)
    ids(people, "name IN('Addams', 'Bierce')") shouldBe Set(1L, 2L)
    ids(people, "NOT name IN('Addams', 'Bierce')") shouldBe Set(3L, 4L)
    ids(people, "name LIKE 'A%'") shouldBe Set(1L)
    ids(people, "name LIKE '%e%'") shouldBe Set(2L, 3L, 4L)
    ids(people, "name NOT LIKE '%e%'") shouldBe Set(1L)
    ids(people, "name ILIKE 'd%'") shouldBe Set(4L)
    // '_' matches any char, so the literal '%' in row 1's value matches too
    ids(people, "s LIKE 'a_b'") shouldBe Set(1L, 2L)
    val withNull = people.withColumn("maybe", when(col("id") === 1, lit(null: String)).otherwise(col("name")))
    ids(withNull, "maybe IS NULL") shouldBe Set(1L)
    ids(withNull, "maybe IS NOT NULL") shouldBe Set(2L, 3L, 4L)
  }

  test("bare IN is the feature-ID filter") {
    Cql.filter(people, "IN (1, 3)", idColumn = "id")
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 3L)
    Cql.filter(people.withColumn("fid", concat(lit("f"), col("id"))), "IN ('f1', 'f2')", idColumn = "fid")
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 2L)
  }

  test("BBOX, case-insensitive, optional CRS") {
    ids(people, "BBOX(geom, -10,-10,20,20)") shouldBe Set(1L, 2L)
    ids(people, "bbox(geom, -50, -50, 50, 50)") shouldBe Set(1L, 2L, 3L, 4L)
    ids(people, "bbox(geom, -1, -1, 1, 1, 'EPSG:4326')") shouldBe Set(1L)
    // boundary-inclusive (intersects semantics, like the reference)
    ids(people, "BBOX(geom, 10, 10, 20, 20)") shouldBe Set(2L)
    an[Exception] should be thrownBy Cql.parse("bbox(geom,0,0,1,1,'EPSG:3857')")
  }

  test("spatial predicates with WKT literals, either argument order") {
    ids(people, "INTERSECTS(geom, POLYGON ((-1 -1, -1 1, 1 1, 1 -1, -1 -1)))") shouldBe Set(1L)
    ids(people, "INTERSECTS(POLYGON ((-1 -1, -1 1, 1 1, 1 -1, -1 -1)), geom)") shouldBe Set(1L)
    ids(people, "WITHIN(geom, POLYGON ((5 5, 5 50, 50 50, 50 5, 5 5)))") shouldBe Set(2L, 3L)
    ids(people, "CONTAINS(POLYGON ((5 5, 5 50, 50 50, 50 5, 5 5)), geom)") shouldBe Set(2L, 3L)
    ids(people, "DISJOINT(geom, POLYGON ((-1 -1, -1 1, 1 1, 1 -1, -1 -1)))") shouldBe Set(2L, 3L, 4L)
    ids(people, "EQUALS(geom, POINT (10 10))") shouldBe Set(2L)
    ids(people, "RELATE(geom, POINT (10 10), 'T*F**FFF*')") shouldBe Set(2L) // equals pattern
  }

  test("WKT EMPTY literals (keyword + EMPTY, no parens) parse like GeoTools") {
    ids(people, "INTERSECTS(geom, POINT EMPTY)") shouldBe Set.empty
    ids(people, "DISJOINT(geom, MULTIPOLYGON EMPTY)") shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("DWITHIN / BEYOND with unit conversion") {
    // ~157km between (0,0) and (1,1) geodesically
    ids(people, "DWITHIN(geom, POINT (1 1), 200000, meters)") shouldBe Set(1L)
    ids(people, "DWITHIN(geom, POINT (1 1), 200, 'kilometers')") shouldBe Set(1L)
    ids(people, "BEYOND(geom, POINT (1 1), 200, 'kilometers')") shouldBe Set(2L, 3L, 4L)
    // feet: 200km = 656168 ft
    ids(people, "DWITHIN(geom, POINT (1 1), 656168, 'feet')") shouldBe Set(1L)
    // the one two-word unit must parse BARE too (lexes as two idents)
    ids(people, "DWITHIN(geom, POINT (1 1), 125, statute miles)") shouldBe Set(1L)
    ids(people, "DWITHIN(geom, POINT (1 1), 125, 'statute miles')") shouldBe Set(1L)
    an[Exception] should be thrownBy Cql.parse("DWITHIN(geom, POINT (1 1), 5, furlongs)")
  }

  test("query normalization: IDL polygons split, whole-world INCLUDE, out-of-bounds trim") {
    // the QueryPlanFilterVisitor semantics (FilterHelperTest): a polygon
    // spanning > 180 degrees of longitude means "crosses the
    // antimeridian" — rows near +-180 match, rows in the naive interior
    // do not
    val pts = Seq(
      (1L, -175.0, 18.0), // inside the west IDL piece
      (2L, 170.0, 18.0),  // inside the east IDL piece
      (3L, 0.0, 20.0),    // inside the NAIVE (unsplit) polygon only
      (4L, -60.0, -60.0)  // nowhere near
    ).toDF("id", "lon", "lat")
      .withColumn("geom", StFunctions.stMakePoint(col("lon"), col("lat")))
    val idl = "POLYGON ((-150 23, -164 11, 45 23, 49 30, -150 23))"
    ids(pts, s"INTERSECTS(geom, $idl)") shouldBe Set(1L, 2L)
    ids(pts, s"INTERSECTS($idl, geom)") shouldBe Set(1L, 2L)
    ids(pts, s"DWITHIN(geom, $idl, 100000, meters)") shouldBe Set(1L, 2L)
    // out-of-bounds bbox covers the world -> INCLUDE (matches even a
    // row whose geometry is null, because the filter is dropped)
    val withNull = pts.withColumn("geom",
      when(col("id") === 4L, lit(null).cast("binary")).otherwise(col("geom")))
    ids(withNull, "BBOX(geom, -181, -91, 181, 91)") shouldBe Set(1L, 2L, 3L, 4L)
    // whole-world polygon literal -> INCLUDE for intersects
    ids(withNull, "INTERSECTS(geom, POLYGON ((-180 -90, -180 90, 180 90, 180 -90, -180 -90)))") shouldBe
      Set(1L, 2L, 3L, 4L)
    // ... and for prop WITHIN whole-world, but NOT for whole-world WITHIN prop
    ids(withNull, "WITHIN(geom, POLYGON ((-180 -90, -180 90, 180 90, 180 -90, -180 -90)))") shouldBe
      Set(1L, 2L, 3L, 4L)
    ids(pts, "WITHIN(POLYGON ((-180 -90, -180 90, 180 90, 180 -90, -180 -90)), geom)") shouldBe Set.empty
    // bbox partially out of bounds trims (not dateline-reinterpreted)
    ids(pts, "BBOX(geom, -200, 10, -160, 30)") shouldBe Set(1L)
    // bbox entirely outside the world -> EXCLUDE
    ids(pts, "BBOX(geom, 200, 10, 250, 30)") shouldBe Set.empty
    // out-of-bounds polygon literal is trimmed like the reference's
    // planner (intersection with the world polygon, no translation)
    ids(pts, "INTERSECTS(geom, POLYGON ((-200 10, -200 30, -160 30, -160 10, -200 10)))") shouldBe Set(1L)
    // explicit multi-geometries OR apart (recreateAsIdlSafeFilter)
    ids(pts, "INTERSECTS(geom, MULTIPOLYGON (((-176 17, -176 19, -174 19, -174 17, -176 17)), ((-1 19, -1 21, 1 21, 1 19, -1 19))))") shouldBe
      Set(1L, 3L)
  }

  test("temporal: DURING strict interval, instant/period forms") {
    ids(people, "dtg DURING 2014-01-01T00:00:00Z/2014-02-03T00:00:00Z") shouldBe Set(1L, 2L)
    ids(people, "dtg during 2014-02-01T00:00:00.000Z/2014-02-03T00:00:00.000Z") shouldBe Set(2L)
    // start bound is exclusive (ISO 19108)
    ids(people, "dtg DURING 2014-01-05T10:00:00Z/2014-02-03T00:00:00Z") shouldBe Set(2L)
    // instant/period and period/instant
    ids(people, "dtg DURING 2014-01-01T00:00:00Z/P40D") shouldBe Set(1L, 2L)
    ids(people, "dtg DURING P40D/2014-02-10T00:00:00Z") shouldBe Set(1L, 2L)
    ids(people, "dtg DURING 2014-01-05T09:59:59Z/T2S") shouldBe Set(1L)
    // end bound exclusive: interval (09:59:58, 10:00:00) misses 10:00:00
    ids(people, "dtg DURING 2014-01-05T09:59:58Z/T2S") shouldBe Set.empty
  }

  test("temporal: BEFORE / AFTER / TEQUALS, quoted instants in comparisons") {
    ids(people, "dtg BEFORE 2014-01-02T00:00:00Z") shouldBe Set.empty
    ids(people, "dtg BEFORE 2014-02-02T12:00:01Z") shouldBe Set(1L, 2L)
    ids(people, "dtg AFTER 2014-02-02T00:00:00Z") shouldBe Set(2L, 3L, 4L)
    ids(people, "dtg TEQUALS 2014-03-10T00:00:00Z") shouldBe Set(3L)
    ids(people, "dtg > '2014-02-02T00:00:00.000Z'") shouldBe Set(2L, 3L, 4L)
    ids(people, "dtg >= '2014-02-02' and dtg < '2014-06-01'") shouldBe Set(2L, 3L)
    ids(people, "dtg BETWEEN '2014-01-01T00:00:00Z' and '2014-02-02T12:00:00Z'") shouldBe Set(1L, 2L)
  }

  test("functions: geometryType, strToUpperCase, jsonPath") {
    ids(people, "geometryType(geom) = 'Point'") shouldBe Set(1L, 2L, 3L, 4L)
    ids(people, "geometryType(geom) = 'Polygon'") shouldBe Set.empty
    ids(people, "strToUpperCase(name) = 'DOYLE'") shouldBe Set(4L)
    ids(people, "strToLowerCase(name) LIKE 'a%'") shouldBe Set(1L)
    ids(people, "strLength(name) = 5") shouldBe Set(4L) // doyle
    ids(people, "st_x(geom) > 5") shouldBe Set(2L, 3L)

    val js = people.withColumn("json",
      concat(lit("""{"foo":"bar","n":"""), col("id"), lit("}")))
    ids(js, "jsonPath('$.json.foo') = 'bar'") shouldBe Set(1L, 2L, 3L, 4L)
    ids(js, "jsonPath('$.json.n') = '2'") shouldBe Set(2L)
    val js2 = people.withColumn("json", lit("""{"bar bar":{"boo":"hiss"}}"""))
    ids(js2, "jsonPath('$.json.[''bar bar''].boo') = 'hiss'") shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("currentDate() comparisons") {
    // all dtg values are far in the past
    ids(people, "dtg < currentDate()") shouldBe Set(1L, 2L, 3L, 4L)
    ids(people, "dtg > currentDate('-P1D') AND dtg < currentDate()") shouldBe Set.empty
    ids(people, "dtg < currentDate('P2D')") shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("property resolution overrides (lon/lat tables keep pushdown shape)") {
    val noGeom = people.drop("geom")
    val c = Cql.parse("BBOX(geom, -10,-10,20,20)",
      props = Map("geom" -> StFunctions.stMakePoint(col("lon"), col("lat"))))
    noGeom.where(c).select("id").as[Long].collect().toSet shouldBe Set(1L, 2L)
  }

  test("quoted property names and mixed spatio-temporal-attribute filter") {
    ids(people, "\"age\" = 15") shouldBe Set(1L)
    ids(people,
      "BBOX(geom, -50, -50, 50, 50) AND dtg DURING 2014-01-01T00:00:00Z/2014-04-01T00:00:00Z AND age > 20"
    ) shouldBe Set(2L, 3L)
  }

  test("parse errors are loud") {
    an[Exception] should be thrownBy Cql.parse("age = ")
    an[Exception] should be thrownBy Cql.parse("(age = 5")
    an[Exception] should be thrownBy Cql.parse("age DURING x/y")
    an[Exception] should be thrownBy Cql.parse("name LIKE 5")
    an[Exception] should be thrownBy Cql.parse("unknownFn(age) = 5")
    an[Exception] should be thrownBy Cql.parse("age = 5 extra")
  }

  test("proxyId(): consistent, unique int proxies for ids; uuid mode throws on bad uuids") {
    // reference ProxyIdFunctionTest: same id -> same proxy, different
    // ids -> different proxies, both for plain and uuid-typed ids
    import spark.implicits._
    val df = Seq("fid0", "fid1").toDF("id")
    val plain = df.select(Cql.parseExpression("proxyId()").as("p")).as[Int].collect()
    df.select(Cql.parseExpression("proxyId()").as("p")).as[Int].collect() shouldBe plain
    plain(0) should not be plain(1)
    plain(0) shouldBe scala.util.hashing.MurmurHash3.stringHash("fid0")

    val uuids = Seq("28a12c18-e5ae-4c04-ae7b-bf7cdbfaf234",
      "28a12c18-e5ae-4c04-ae7b-bf7cdbfaf235").toDF("id")
    val viaUuid = uuids.select(Cql.parseExpression("proxyId('uuid')").as("p")).as[Int].collect()
    viaUuid(0) should not be viaUuid(1)
    // uuid mode differs from string mode (the reference's two paths)
    viaUuid(0) should not be scala.util.hashing.MurmurHash3.stringHash("28a12c18-e5ae-4c04-ae7b-bf7cdbfaf234")

    val bad = Seq("not a uuid").toDF("id")
    an[Exception] should be thrownBy
      bad.select(Cql.parseExpression("proxyId('uuid')").as("p")).collect()
  }

  test("quoted $.path property names resolve through the JSON accessor " +
    "(AccumuloDataStoreJsonTest fixture shape)") {
    import spark.implicits._
    val df = Seq(
      ("1", """{"type":"Feature","properties":{"characteristics":{"height":20}}}"""),
      ("2", """{"type":"Feature","properties":{"characteristics":{"height":30}}}"""),
      ("3", """{"type":"Feature","properties":{}}"""),
      ("4", null)).toDF("id", "json")
    val hit = Cql.filter(df, """"$.json.properties.characteristics.height" = 30""")
      .select("id").as[String].collect()
    hit shouldBe Array("2")
    // the same path as a transform expression: "20", "30", null, null
    val heights = df.select(
      Cql.parseExpression(""""$.json.properties.characteristics.height"""").as("h"))
      .as[String].collect()
    heights.toSeq shouldBe Seq("20", "30", null, null)
  }

  test("parity with hand-written Columns on a larger frame") {
    val n = 2000
    val df = spark.range(n).select(
      col("id"),
      (col("id") % 360 - 180).cast("double").as("lon"),
      (col("id") % 170 - 85).cast("double").as("lat"),
      (col("id") % 97).cast("double").as("v"),
      concat(lit("u"), col("id") % 13).as("tag"))
      .withColumn("geom", StFunctions.stMakePoint(col("lon"), col("lat")))
    val cql = "BBOX(geom, -60, -30, 40, 45) AND v BETWEEN 10 AND 80 AND tag IN ('u1','u5','u7') AND NOT v = 50"
    val manual = df.where(
      StFunctions.stIntersects(col("geom"), lit(graft.geom.GeomOps.toWkb(graft.geom.GeomOps.bbox(-60, -30, 40, 45)))) &&
        col("v") >= 10 && col("v") <= 80 &&
        col("tag").isin("u1", "u5", "u7") && !(col("v") === 50))
    val got = Cql.filter(df, cql).select("id").as[Long].collect().toSet
    val want = manual.select("id").as[Long].collect().toSet
    got shouldBe want
    want should not be empty
  }
}
