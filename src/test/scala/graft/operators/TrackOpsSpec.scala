package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.functions.StFunctions
import graft.geom.GeomOps

/** Tube-select and route-search semantics vs brute-force oracles. */
class TrackOpsSpec extends AnyFunSuite with SparkTest {

  private lazy val ready: Unit = StFunctions.register(spark)

  test("tube select: in-corridor + in-time features only, matches brute force") {
    ready
    import spark.implicits._
    // straight west->east track along lat 40, one point per 10 minutes
    val t0 = 1700000000000L
    val track = (0 until 10).map(i => (i * 0.1, 40.0, t0 + i * 600000L))
      .toDF("tlon", "tlat", "tmillis")
    val rnd = new scala.util.Random(23)
    val features = (0 until 400).map { i =>
      val lon = rnd.nextDouble() * 1.4 - 0.2
      val lat = 40.0 + (rnd.nextDouble() - 0.5) * 0.8 // most outside the ~11km tube
      val ts = t0 + (rnd.nextDouble() * 7200000L).toLong - 600000L
      (s"f$i", lon, lat, ts)
    }.toDF("fid", "lon", "lat", "millis")

    val bufferM = 10000.0
    val slackMs = 300000L
    val got = TrackOps.tubeSelect(spark, features, "fid", "lon", "lat", "millis",
        track, "tlon", "tlat", "tmillis", bufferM, slackMs)
      .select("fid").collect().map(_.getString(0)).toSet

    // brute force: cross join features x segments, same predicates
    val segs = TrackOps.tubeSegments(track, "tlon", "tlat", "tmillis", bufferM, slackMs)
    val brute = features.crossJoin(segs)
      .where(expr("st_intersects(st_makePoint(lon, lat), tube_geom)") &&
        col("millis").between(col("t0"), col("t1")))
      .select("fid").distinct().collect().map(_.getString(0)).toSet
    assert(got == brute)
    assert(brute.nonEmpty && brute.size < 400, s"tube selected ${brute.size} of 400")
  }

  test("tube segments carry buffered corridors and slacked windows") {
    ready
    import spark.implicits._
    val track = Seq((0.0, 0.0, 1000L), (0.1, 0.0, 2000L)).toDF("tlon", "tlat", "tmillis")
    val seg = TrackOps.tubeSegments(track, "tlon", "tlat", "tmillis", 5000.0, 100L).head
    assert(seg.getAs[Long]("t0") == 900L && seg.getAs[Long]("t1") == 2100L)
    val g = GeomOps.fromWkb(seg.getAs[Array[Byte]]("tube_geom"))
    assert(g.contains(GeomOps.point(0.05, 0.0))) // corridor covers the segment
    assert(!g.contains(GeomOps.point(0.05, 0.5))) // but not far off-axis
  }

  test("route search: close + heading-aligned features only, matches brute force") {
    ready
    import spark.implicits._
    // north-south route at lon 10 (bearing ~0/180)
    val route = (0 until 6).map(i => (10.0, 40.0 + i * 0.1, i)).toDF("rlon", "rlat", "seq")
    val rnd = new scala.util.Random(31)
    val features = (0 until 300).map { i =>
      val lon = 10.0 + (rnd.nextDouble() - 0.5) * 0.4
      val lat = 40.0 + rnd.nextDouble() * 0.5
      val heading = rnd.nextDouble() * 360.0
      (s"f$i", lon, lat, heading)
    }.toDF("fid", "lon", "lat", "heading")

    val meters = 5000.0
    val tol = 20.0
    val got = TrackOps.routeSearch(spark, features, "fid", "lon", "lat", "heading",
        route, "rlon", "rlat", "seq", meters, tol, bidirectional = true)
      .select("fid").collect().map(_.getString(0)).toSet

    // brute force replicates routeSearch's SPHERICAL bearing
    val sb = {
      val phi1 = radians(col("sy0")); val phi2 = radians(col("sy1"))
      val dl = radians(col("sx1") - col("sx0"))
      (degrees(atan2(sin(dl) * cos(phi2),
        cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dl))) + 360.0) % 360.0
    }
    val segs = TrackOps.routeSegments(route, "rlon", "rlat", "seq")
      .withColumn("seg_bearing", sb)
      .withColumn("seg_geom", expr("st_geomFromWKT(concat('LINESTRING(', sx0, ' ', sy0, ', ', sx1, ' ', sy1, ')'))"))
    val hd = least(abs(col("heading") - col("seg_bearing")),
      lit(360.0) - abs(col("heading") - col("seg_bearing")))
    val brute = features.crossJoin(segs)
      .where(expr(s"st_dwithin(st_makePoint(lon, lat), seg_geom, $meters)") &&
        least(hd, abs(hd - 180.0)) <= tol)
      .select("fid").distinct().collect().map(_.getString(0)).toSet
    assert(got == brute)
    assert(brute.nonEmpty && brute.size < 300)
  }

  // TubeBinTest (accumulo process/tube/TubeBinTest.scala:27-66): 19
  // daily points, buffered, time-binned and unioned per bin
  test("NoGapFill timeBinAndUnion: bin counts and per-bin union/time range") {
    ready
    import spark.implicits._
    val fmt = java.time.format.DateTimeFormatter.ISO_INSTANT
    val tubes = (1 until 20).map { day =>
      val c = 40.0 + day
      val t = java.time.Instant.parse(f"2011-01-$day%02dT00:00:00Z").toEpochMilli
      val disk = GeomOps.factory
        .createPoint(new org.locationtech.jts.geom.Coordinate(c, c)).buffer(1.0)
      (GeomOps.toWkb(disk), t)
    }.toDF("geom", "millis")

    // maxBins = 1 -> one bin; 0 -> one feature per bin (reference asserts)
    assert(TrackOps.timeBinAndUnion(tubes, "geom", "millis", 1).count() == 1L)
    assert(TrackOps.timeBinAndUnion(tubes, "geom", "millis", 0).count() == 19L)

    // maxBins = 6 -> binSize = ceil(19/6) = 4 -> 5 bins of 4,4,4,4,3
    val binned = TrackOps.timeBinAndUnion(tubes, "geom", "millis", 6).collect()
    assert(binned.length == 5)
    val t = (d: Int) => java.time.Instant.parse(f"2011-01-$d%02dT00:00:00Z").toEpochMilli
    val ranges = binned.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("start"), r.getAs[Long]("end"))).toSeq
    assert(ranges == Seq((0L, t(1), t(4)), (1L, t(5), t(8)), (2L, t(9), t(12)),
      (3L, t(13), t(16)), (4L, t(17), t(19))))
    // consecutive disks overlap (centers sqrt(2) apart, radius 1), so each
    // bin unions into ONE connected polygon that covers every member
    // center and only its own bin's centers
    binned.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val g = GeomOps.fromWkb(r.getAs[Array[Byte]]("geom"))
      assert(g.getNumGeometries == 1)
      (1 until 20).foreach { day =>
        val c = 40.0 + day
        val inBin = (day - 1) / 4 == bin
        val p = GeomOps.factory.createPoint(new org.locationtech.jts.geom.Coordinate(c, c))
        // neighbor-bin centers are sqrt(2) > 1 away from any member disk
        assert(g.covers(p) == inBin, s"day $day vs bin $bin")
      }
    }
    // one bin: the union spans the whole track's time range
    val one = TrackOps.timeBinAndUnion(tubes, "geom", "millis", 1).collect().head
    assert(one.getAs[Long]("start") == t(1) && one.getAs[Long]("end") == t(19))
  }
}
