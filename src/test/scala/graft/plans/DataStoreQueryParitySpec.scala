package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.StFunctions
import graft.geom.GeomOps
import graft.table.SpatialTable
import org.locationtech.jts.geom.Coordinate
import org.locationtech.jts.io.WKTReader

/**
 * Port of the reference's flagship datastore query-semantics cases
 * (/root/reference/geomesa-accumulo/geomesa-accumulo-datastore/src/test/
 * scala/.../data/AccumuloDataStoreQueryTest.scala:55-210) through the
 * indexed CQL surface (SpatialTable.queryCql = SpatialFilterRule
 * pushdown + cell ranges + exact refine):
 *
 *  - EXCLUDE / INCLUDE queries;
 *  - DWithin of a point in meters (the disjoint-bounds regression);
 *  - DWithin of a LineString AND dtg DURING, asserted differentially
 *    against a brute-force evaluator sharing no code with the engine
 *    (the fixture's 50-included / 150-excluded shape regenerated
 *    deterministically rather than copied);
 *  - out-of-world bboxes (the geoserver open-layers preview case:
 *    the >180-degree branch trims to EXCLUDE, the OR's in-world branch
 *    still matches);
 *  - overlapping-OR inclusion-exclusion (each feature exactly once, no
 *    duplicates from branches that both match — the reference's
 *    1000-point OR dedup case).
 */
class DataStoreQueryParitySpec extends AnyFunSuite {

  private lazy val spark: org.apache.spark.sql.SparkSession = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-dsquery-parity-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    StFunctions.register(s)
    s
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("fid").collect().map(_.getString(0)).toSet

  // the reference's defaultSft fixture: fid-1 at POINT(45 49)
  private lazy val defaultRoot: String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsq_default").toString
    val df = Seq(
      ("fid-1", 45.0, 49.0, java.sql.Timestamp.valueOf("2010-05-07 12:00:00")),
      ("fid-2", 48.0, 52.0, java.sql.Timestamp.valueOf("2010-05-07 12:00:00")))
      .toDF("fid", "lon", "lat", "dtg")
    SpatialTable.write(spark, df, dir, "s1", "fid", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 2)
    dir
  }

  private def q(root: String, cql: String): org.apache.spark.sql.DataFrame =
    SpatialTable.queryCql(spark, root, "s1", cql, idColumn = "fid")

  test("an exclude query returns nothing; include returns everything") {
    assert(q(defaultRoot, "EXCLUDE").count() === 0)
    assert(ids(q(defaultRoot, "INCLUDE")) === Set("fid-1", "fid-2"))
  }

  test("a bbox disjoint from the data returns no results") {
    assert(q(defaultRoot, "BBOX(geom, 64.9,68.9,65.1,69.1)").count() === 0)
  }

  test("DWithin of a point in meters: only the near feature") {
    val got = ids(q(defaultRoot, "DWITHIN(geom, POINT(45.000001 48.99999), 100.0, meters)"))
    assert(got === Set("fid-1"))
  }

  test("DWithin of a LineString AND dtg DURING: indexed path equals brute force") {
    val s = spark
    import s.implicits._
    // the fixture's line (-45 0) -> (-90 45); near points ~33km off the
    // line (included at 150km), far points ~330-550km off (excluded)
    val reader = new WKTReader()
    val line = reader.read("LINESTRING(-45 0, -90 45)")
    val inWindow = java.sql.Timestamp.valueOf("2014-06-07 12:00:00")
    val outWindow = java.sql.Timestamp.valueOf("2014-06-08 12:00:00")
    val pts = (0 until 50).flatMap { t =>
      val bx = -45.0 - 45.0 * t / 49.0
      val by = 45.0 * t / 49.0
      // perpendicular to the line's (-1, 1)/sqrt2 direction is (1, 1)/sqrt2
      val near = (bx + 0.21, by + 0.21)
      val far = (bx + 3.0, by + 3.0)
      Seq((s"in$t", near._1, near._2, inWindow),
        (s"ex$t", far._1, far._2, inWindow),
        // near in space but outside the time window
        (s"late$t", near._1, near._2, outWindow))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_dsq_dwithin").toString
    SpatialTable.write(spark, pts.toDF("fid", "lon", "lat", "dtg"), dir, "s1",
      "fid", "lon", "lat", res = 9, prefixRes = 3, salts = 2, partitions = 4)

    val cql = "DWITHIN(geom, LINESTRING(-45 0, -90 45), 150000.0, meters) AND " +
      "dtg DURING 2014-06-07T11:00:00.000Z/2014-06-07T13:00:00.000Z"
    val got = ids(q(dir, cql))

    val gf = GeomOps.factory
    val brute = pts.filter { case (_, lon, lat, ts) =>
      val p = gf.createPoint(new Coordinate(lon, lat))
      GeomOps.distanceSphereMeters(p, line) < 150000.0 &&
        ts.getTime > java.time.Instant.parse("2014-06-07T11:00:00Z").toEpochMilli &&
        ts.getTime < java.time.Instant.parse("2014-06-07T13:00:00Z").toEpochMilli
    }.map(_._1).toSet

    assert(got === brute)
    // the fixture's shape: every near/in-window point included, nothing else
    assert(brute === (0 until 50).map(t => s"in$t").toSet)
  }

  test("out-of-world bboxes: the >180-degree branch trims away, the in-world OR branch matches") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsq_oow").toString
    val df = Seq(("1", -100.236523, 23.0, java.sql.Timestamp.valueOf("2014-01-01 00:00:00")))
      .toDF("fid", "lon", "lat", "dtg")
    SpatialTable.write(spark, df, dir, "s1", "fid", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 2)
    val ecql = "BBOX(geom, 254.17968736588955,16.52343763411045,264.02343736588955,26.36718763411045) OR " +
      "BBOX(geom, -105.82031263411045,16.52343763411045,-95.97656263411045,26.36718763411045)"
    assert(ids(q(dir, ecql)) === Set("1"))
    // the out-of-world branch alone matches nothing (trimmed to EXCLUDE)
    assert(q(dir, "BBOX(geom, 254.17968736588955,16.52343763411045,264.02343736588955,26.36718763411045)")
      .count() === 0)
  }

  test("overlapping OR branches obey inclusion-exclusion: every feature exactly once") {
    val s = spark
    import s.implicits._
    // 1000 deterministic points in (-0.001, 0.001)^2 (the reference uses
    // Random; determinism here, same box)
    val rng = new scala.util.Random(7)
    val pts = (0 until 1000).map { i =>
      (s"fid-$i", -0.001 + 0.002 * rng.nextDouble(), -0.001 + 0.002 * rng.nextDouble(),
        java.sql.Timestamp.valueOf("2014-01-01 00:00:00"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_dsq_or").toString
    SpatialTable.write(spark, pts.toDF("fid", "lon", "lat", "dtg"), dir, "s1",
      "fid", "lon", "lat", res = 9, prefixRes = 3, salts = 2, partitions = 4)
    // the two branches overlap on x in [0, 0.001): both match the same rows
    val or = "BBOX(geom, -0.001,-0.001,0.001,0.001) OR BBOX(geom, 0.0,-0.001,0.001,0.001)"
    val got = q(dir, or).select("fid").collect().map(_.getString(0))
    assert(got.length === 1000, "OR branches must not duplicate rows")
    assert(got.toSet === pts.map(_._1).toSet)
  }
}
