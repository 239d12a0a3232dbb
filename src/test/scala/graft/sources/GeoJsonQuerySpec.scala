package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.functions.StFunctions

/** GeoJSON store + mongo-style query language — semantics cases from the
  * reference's GeoJsonQueryTest / GeoJsonGtIndexTest shapes
  * (geomesa-geojson-api). */
class GeoJsonQuerySpec extends AnyFunSuite with SparkTest {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_geojson").toString

  test("geometry parser inverts the writer for every geometry type") {
    import graft.geom.{GeoJson, GeomOps => G}
    val wkts = Seq(
      "POINT (10 20)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    for (wkt <- wkts) {
      val g = G.fromWkt(wkt)
      val back = GeoJson.read(GeoJson.write(g))
      assert(back.equalsExact(g), s"round-trip failed for $wkt")
    }
    intercept[IllegalArgumentException](GeoJson.read("""{"type":"Nope","coordinates":[]}"""))
    intercept[IllegalArgumentException](GeoJson.read("""[1,2]"""))
    // structurally malformed input raises the same named error, not NPE
    intercept[IllegalArgumentException](GeoJson.read("""{"type":"Point"}"""))
    intercept[IllegalArgumentException](GeoJson.read("""{"type":"Point","coordinates":[1]}"""))
    intercept[IllegalArgumentException](GeoJson.read("""{"type":"Point","coordinates":["a","b"]}"""))
    intercept[IllegalArgumentException](GeoJson.read("""{"type":"GeometryCollection"}"""))
  }

  test("Export.geoJson -> GeoJsonQuery.read round-trips features") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "a", 10.0, 20.0), (2L, "b", -30.0, 40.0))
      .toDF("id", "name", "x", "y")
      .selectExpr("id", "name", "st_makePoint(x, y) AS geom")
    val dir = tmp() + "/docs"
    Export.geoJson(df, "geom", dir)
    val back = GeoJsonQuery.read(spark, dir)
    assert(back.columns.toSeq == Seq("geometry", "properties"))
    val rows = back.select(
      get_json_object(col("properties"), "$.id").cast("long").as("id"),
      StFunctions.stX(col("geometry")).as("x")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows == Map(1L -> 10.0, 2L -> -30.0))
  }

  test("query language: equality, comparisons, $or, implicit and") {
    StFunctions.register(spark)
    import spark.implicits._
    val big = 9007199254740993L // 2^53 + 1
    val docs = Seq(
      (1L, "click", 5.0, 10.0, 20.0), (2L, "view", 15.0, 30.0, 40.0),
      (3L, "click", 25.0, 50.0, 60.0), (4L, "error", 7.5, 10.0, 21.0),
      (big, "big", -1.0, 0.0, 0.0))
      .toDF("id", "kind", "score", "x", "y")
      .selectExpr("id", "kind", "score", "st_makePoint(x, y) AS geom")
    val dir = tmp() + "/q"
    Export.geoJson(docs, "geom", dir)
    val parsed = GeoJsonQuery.read(spark, dir).cache()
    def ids(q: String): Seq[Long] =
      GeoJsonQuery.query(parsed, q)
        .select(get_json_object(col("properties"), "$.id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids("{}") == Seq(1L, 2L, 3L, 4L, big))
    assert(ids("""{"kind":"click"}""") == Seq(1L, 3L))
    assert(ids("""{"score":{"$lt":10}}""") == Seq(1L, 4L, big))
    assert(ids("""{"score":{"$gte":15}}""") == Seq(2L, 3L))
    assert(ids("""{"kind":"click","score":{"$gt":10}}""") == Seq(3L))
    assert(ids("""{"$or":[{"kind":"error"},{"score":{"$gt":20}}]}""") == Seq(3L, 4L))
    // json-path property form, like the reference's checkJsonPaths
    assert(ids("""{"$.kind":"view"}""") == Seq(2L))
    // EVERY operator in an operator object applies (range query)
    assert(ids("""{"score":{"$gte":7,"$lt":20}}""") == Seq(2L, 4L))
    // integral comparisons are exact past 2^53: the neighboring value
    // (which a double compare would collapse onto) must NOT match
    assert(ids(s"""{"id":$big}""") == Seq(big))
    assert(ids(s"""{"id":${big - 1}}""") == Seq())
    assert(ids("""{"id":3}""") == Seq(3L))
    // malformed queries fail loudly instead of matching everything/nothing
    intercept[IllegalArgumentException](GeoJsonQuery.compile("""{"score":{"$bogus":1}}"""))
    intercept[IllegalArgumentException](
      GeoJsonQuery.compile("""{"$or":[{"kind":"click"},"typo"]}"""))
    intercept[IllegalArgumentException](
      GeoJsonQuery.compile("""{"$and":[{"kind":"click"}]}"""))
    intercept[IllegalArgumentException](GeoJsonQuery.compile("""{"tags":{"a":1}}"""))
    intercept[IllegalArgumentException](GeoJsonQuery.compile("""{"tags":[1,2]}"""))
  }

  test("indexed document store: pruned query equals full-scan query, fewer files read") {
    StFunctions.register(spark)
    import spark.implicits._
    val r = new scala.util.Random(7)
    val pts = (0 until 4000).map(i =>
      (i.toLong, r.nextDouble() * 300 - 150, r.nextDouble() * 140 - 70, "pt"))
      .toDF("id", "x", "y", "kind")
      .selectExpr("id", "kind", "st_makePoint(x, y) AS geom")
    // a large polygon whose CENTROID (35, 0) is outside the query bbox
    // [0,-10,20,10] but which intersects it — the extent-padded pruning
    // must still find it
    val poly = Seq((99999L, "zone",
      "POLYGON((10 -5, 60 -5, 60 5, 10 5, 10 -5))")).toDF("id", "kind", "wkt")
      .selectExpr("id", "kind", "st_geomFromWKT(wkt) AS geom")
    val dir = tmp() + "/idx"
    Export.geoJson(pts.unionByName(poly), "geom", dir)
    val store = GeoJsonQuery.read(spark, dir)

    val root = tmp() + "/idxroot"
    GeoJsonQuery.index(spark, store, root, "docs", prefixRes = 3, partitions = 8)
    // idempotent resume
    GeoJsonQuery.index(spark, store, root, "docs", prefixRes = 3, partitions = 8)

    val q = """{"geometry":{"$bbox":[0,-10,20,10]},"kind":{"$gte":"a"}}"""
    def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(get_json_object(col("properties"), "$.id").cast("long"))
        .collect().map(_.getLong(0)).toSet
    val viaIndex = GeoJsonQuery.queryIndexed(spark, root, "docs", q)
    val viaScan = GeoJsonQuery.query(store, q)
    assert(idsOf(viaIndex) == idsOf(viaScan))
    assert(idsOf(viaIndex).contains(99999L), "extent padding must keep the wide polygon")
    assert(idsOf(viaIndex).size > 1)

    // the indexed path scans fewer files than the full snapshot
    import org.apache.spark.sql.execution.FileSourceScanExec
    def files(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    }
    val all = files(GeoJsonQuery.queryIndexed(spark, root, "docs", "{}"))
    val pruned = files(GeoJsonQuery.queryIndexed(spark, root, "docs",
      """{"geometry":{"$bbox":[0,-10,20,10]}}"""))
    assert(pruned < all, s"pruned=$pruned all=$all")

    // disjoint spatial conjuncts intersect to an inverted envelope:
    // a legitimate empty result, not a NegativeArraySizeException
    val disjoint =
      """{"geometry":{"$bbox":[0,0,10,10],
        |"$intersects":{"$geometry":{"type":"Point","coordinates":[120,50]}}}}""".stripMargin
    assert(GeoJsonQuery.queryIndexed(spark, root, "docs", disjoint).count() == 0L)
  }

  test("a GeoJSON store joins spatially like any WKB table") {
    StFunctions.register(spark)
    import spark.implicits._
    val r = new scala.util.Random(42)
    val docs = (0 until 500).map(i => (i.toLong, r.nextDouble() * 60 - 30, r.nextDouble() * 60 - 30))
      .toDF("id", "x", "y").selectExpr("id", "st_makePoint(x, y) AS geom")
    val dir = tmp() + "/join"
    Export.geoJson(docs, "geom", dir)
    val store = GeoJsonQuery.read(spark, dir)
      .select(get_json_object(col("properties"), "$.id").cast("long").as("id"), col("geometry"))
    val zones = Seq((1L, "POLYGON((-20 -20, 10 -20, 10 10, -20 10, -20 -20))"),
      (2L, "POLYGON((0 0, 25 0, 25 25, 0 25, 0 0))"))
      .toDF("zone_id", "wkt").selectExpr("zone_id", "st_geomFromWKT(wkt) AS zgeom")
    val joined = graft.operators.SpatialJoin.join(
        store, "geometry", zones, "zgeom",
        (a, b) => StFunctions.stIntersects(a, b), res = 4, leftPoint = true)
      .select("id", "zone_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = store.crossJoin(zones)
      .where(StFunctions.stIntersects(col("geometry"), col("zgeom")))
      .select("id", "zone_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(joined == brute && brute.nonEmpty)
  }

  test("query normalization: IDL split + whole-world INCLUDE through both scan and indexed paths") {
    StFunctions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, -175.0, 18.0), (2L, 170.0, 18.0), (3L, 0.0, 20.0), (4L, -60.0, -60.0))
      .toDF("id", "x", "y").selectExpr("id", "st_makePoint(x, y) AS geom")
    val dir = tmp() + "/idl"
    Export.geoJson(docs, "geom", dir)
    val parsed = GeoJsonQuery.read(spark, dir).cache()
    def ids(q: String): Seq[Long] =
      GeoJsonQuery.query(parsed, q)
        .select(get_json_object(col("properties"), "$.id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
    // wide polygon = IDL-crossing (reference planner rule): matches the
    // dateline rows, NOT the naive interior row
    val idl = """{"geometry":{"$intersects":{"$geometry":{"type":"Polygon",
      "coordinates":[[[-150,23],[-164,11],[45,23],[49,30],[-150,23]]]}}}}"""
    assert(ids(idl) == Seq(1L, 2L))
    // whole-world literal -> INCLUDE
    assert(ids("""{"geometry":{"$intersects":{"$geometry":{"type":"Polygon",
      "coordinates":[[[-180,-90],[180,-90],[180,90],[-180,90],[-180,-90]]]}}}}""") == Seq(1L, 2L, 3L, 4L))
    // out-of-bounds bbox -> INCLUDE; trimmed bbox stays a plain box
    assert(ids("""{"geometry":{"$bbox":[-181,-91,181,91]}}""") == Seq(1L, 2L, 3L, 4L))
    assert(ids("""{"geometry":{"$bbox":[-200,10,-160,30]}}""") == Seq(1L))
    // the indexed (pruned) path returns the same rows for the IDL query
    // — the pruning envelope must cover the SPLIT parts
    val root = tmp() + "/idl_store"
    GeoJsonQuery.index(spark, parsed, root)
    val viaIndex = GeoJsonQuery.queryIndexed(spark, root, queryJson = idl)
      .select(get_json_object(col("properties"), "$.id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIndex == Seq(1L, 2L))
    // whole-world literal through the INDEXED path: the pruning envelope
    // must be the world, not a dateline-collapsed sliver (the world
    // rectangle's 360-degree edges must never reach the unwrap)
    val world = """{"geometry":{"$intersects":{"$geometry":{"type":"Polygon",
      "coordinates":[[[-180,-90],[180,-90],[180,90],[-180,90],[-180,-90]]]}}}}"""
    val worldViaIndex = GeoJsonQuery.queryIndexed(spark, root, queryJson = world)
      .select(get_json_object(col("properties"), "$.id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(worldViaIndex == Seq(1L, 2L, 3L, 4L))
    // ... and $contains (no INCLUDE rule) still compiles against the
    // world polygon rather than a collapsed literal
    assert(GeoJsonQuery.queryEnvelope(world).contains((-180.0, -90.0, 180.0, 90.0)))
  }

  test("query language: spatial predicates over the geometry member") {
    StFunctions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0), (3L, 50.0, 60.0))
      .toDF("id", "x", "y").selectExpr("id", "st_makePoint(x, y) AS geom")
    val dir = tmp() + "/sp"
    Export.geoJson(docs, "geom", dir)
    val parsed = GeoJsonQuery.read(spark, dir).cache()
    def ids(q: String): Seq[Long] =
      GeoJsonQuery.query(parsed, q)
        .select(get_json_object(col("properties"), "$.id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids("""{"geometry":{"$bbox":[0,0,35,45]}}""") == Seq(1L, 2L))
    assert(ids("""{"geometry":{"$intersects":{"$geometry":{"type":"Point","coordinates":[30,40]}}}}""") == Seq(2L))
    assert(ids("""{"geometry":{"$within":{"$geometry":
      {"type":"Polygon","coordinates":[[[5,15],[15,15],[15,25],[5,25],[5,15]]]}}}}""") == Seq(1L))
    // $contains: row geometry contains the query geometry (points contain themselves)
    assert(ids("""{"geometry":{"$contains":{"$geometry":{"type":"Point","coordinates":[50,60]}}}}""") == Seq(3L))
    // $dwithin in kilometers: ~111 km per degree at the equator scale used here
    assert(ids("""{"geometry":{"$dwithin":{"$geometry":{"type":"Point","coordinates":[10,20]},
      "$dist":200,"$unit":"kilometers"}}}""") == Seq(1L))
    // the whole query document compiles to ONE predicate over one scan:
    // no joins, no exchanges, no per-predicate passes
    val q = GeoJsonQuery.query(parsed,
      """{"geometry":{"$bbox":[0,0,35,45]},"$or":[{"id":{"$lt":2}},{"id":3}]}""")
    q.collect()
    val plan = q.queryExecution.executedPlan
    assert(plan.collectLeaves().size == 1, plan.toString.take(800))
    assert(!plan.toString.contains("Exchange"), plan.toString.take(800))
    intercept[IllegalArgumentException](
      GeoJsonQuery.compile("""{"name":{"$bbox":[0,0,1,1]}}"""))
    intercept[IllegalArgumentException](
      GeoJsonQuery.compile("""{"geometry":{"$dwithin":{"$geometry":{"type":"Point","coordinates":[0,0]},
        "$dist":1,"$unit":"parsecs"}}}"""))
  }
}
