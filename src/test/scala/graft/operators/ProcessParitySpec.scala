package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.geom.{GeomOps => G}

/**
 * Ports the reference's process-level test fixtures:
 *
 *  - KNearestNeighborSearchProcessTest.scala (:52-210, accumulo module):
 *    the UVA-pavilion cluster + 1000 seeded random points around
 *    Staunton, with the EXACT expected neighbor ordering from the
 *    "madison" query point, the 400 m/10 km radius counts, and the
 *    ignore-rules for empty/sparse queries.
 *  - ProximitySearchProcessTest.scala (:30-80): query points planted at
 *    exactly 99 m from the data points; pair counts flip from 0 to 6 at
 *    the 99 m boundary.
 *
 * The reference measures geodesic meters; our operators use spherical
 * (haversine) meters. At these fixtures' scales the orderings agree;
 * the proximity query points are planted at 99 m in OUR metric so the
 * boundary assertions test the operator, not the ellipsoid model.
 */
class ProcessParitySpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // KNearestNeighborSearchProcessTest.scala:52-66
  private val cluster = Seq(
    ("rotunda", -78.503547, 38.035475),
    ("pavilion I", -78.503923, 38.035536),
    ("pavilion III", -78.504059, 38.035308),
    ("pavilion V", -78.504276, 38.034971),
    ("pavilion VII", -78.504424, 38.034628),
    ("pavilion IX", -78.504617, 38.034208),
    ("pavilion X", -78.503833, 38.033938),
    ("pavilion VIII", -78.503601, 38.034343),
    ("pavilion VI", -78.503424, 38.034721),
    ("pavilion IV", -78.503180, 38.035039),
    ("pavilion II", -78.503109, 38.035278),
    ("cabell", -78.505152, 38.032704),
    ("beams", -78.510295, 38.034283),
    ("mccormick", -78.522288, 38.032844),
    ("hep", -78.520019, 38.034511))

  // generateTestData(1000, 38.149894, -79.073639, 0.30) with Random(0):
  // per point, lon consumes the first nextDouble, lat the second
  private val distributed: Seq[(String, Double, Double)] = {
    val rng = new scala.util.Random(0)
    (1 to 1000).map { i =>
      val lon = -79.073639 + 0.30 * (rng.nextDouble() - 0.5)
      val lat = 38.149894 + 0.30 * (rng.nextDouble() - 0.5)
      ((100000 + i).toString, lon, lat)
    }
  }

  private lazy val dataDf =
    (cluster ++ distributed).toDF("id", "lon", "lat").cache()

  private def knnFrom(qid: String, qlon: Double, qlat: Double, k: Int) = {
    val queries = Seq((qid, qlon, qlat)).toDF("qid", "qlon", "qlat")
    KnnJoin(spark, dataDf, "lon", "lat", queries, "qid", "qlon", "qlat",
      k, res = 9, tieBreakCols = Seq("id"))
  }

  test("knn: nothing within 10 km of fan mountain (reference: k=5, maxDist 10000 -> 0)") {
    val got = knnFrom("fan mountain", -78.692649, 37.878219, k = 5)
      .where(col("dist") <= 10000.0)
    assert(got.count() == 0)
  }

  test("knn: 11 points within 400 m of madison at k=15 (reference count)") {
    val got = knnFrom("madison", -78.502720, 38.036871, k = 15)
      .where(col("dist") <= 400.0)
    assert(got.count() == 11)
  }

  test("knn: neighbor ORDER around Charlottesville matches the reference list exactly") {
    // KNearestNeighborSearchProcessTest.scala:186-207
    val expected = Seq("rotunda", "pavilion II", "pavilion I", "pavilion IV",
      "pavilion III", "pavilion VI", "pavilion V", "pavilion VII",
      "pavilion VIII", "pavilion IX", "pavilion X", "cabell", "beams",
      "hep", "mccormick")
    val got = knnFrom("madison", -78.502720, 38.036871, k = 15)
      .where(col("dist") <= 2500.0)
      .orderBy("dist")
      .select("id").as[String].collect().toSeq
    assert(got == expected, s"got $got")
  }

  test("knn: three query points, one sparse, still returns results; empty queries return none") {
    val queries = Seq(
      ("madison", -78.502720, 38.036871),
      ("fan mountain", -78.692649, 37.878219),
      ("blackfriars", -79.070569, 38.149185)).toDF("qid", "qlon", "qlat")
    val got = KnnJoin(spark, dataDf, "lon", "lat", queries, "qid", "qlon", "qlat",
      k = 5, res = 9).where(col("dist") <= 5000.0)
    assert(got.count() > 0)
    val none = KnnJoin(spark, dataDf, "lon", "lat",
      Seq.empty[(String, Double, Double)].toDF("qid", "qlon", "qlat"),
      "qid", "qlon", "qlat", k = 100, res = 9)
    assert(none.count() == 0)
  }

  test("route search: the reference's four cases, same Random(-10) fixture (RouteSearchProcessTest)") {
    // RouteSearchProcessTest.scala:29-109 — route (40 40, 40.5 40.5,
    // 40.5 41); four track families: 0 = on the diagonal headed the
    // OPPOSITE way (~217.3), 1 = on the vertical leg aligned (~0),
    // 2 = on the vertical leg with heading off by 5-15, 3 = aligned but
    // ~17-22 km east of the route
    val r = new scala.util.Random(-10)
    val f0 = (0 until 10).map { i =>
      val heading = 217.3 + (r.nextDouble * 10) - 5
      val v = (40.0 + (10 - i) * 0.05) - (r.nextDouble / 100) - 0.005
      (s"0$i", v, v, heading)
    }
    val f1 = (0 until 10).map { i =>
      val heading = (r.nextDouble * 10) - 5
      (s"1$i", 40.5 + (r.nextDouble / 100) - 0.005, 40.5 + (i + 1) * 0.005, heading)
    }
    val f2 = (0 until 10).map { i =>
      val heading = 10 + (r.nextDouble * 10) - 5
      (s"2$i", 40.5 + (r.nextDouble / 100) - 0.005, 40.5 + (i + 1) * 0.005, heading)
    }
    val f3 = (0 until 10).map { i =>
      val heading = (r.nextDouble * 10) - 5
      (s"3$i", 40.7 + (r.nextDouble / 10) - 0.005, 40.5 + (i + 1) * 0.005, heading)
    }
    val features = (f0 ++ f1 ++ f2 ++ f3).toDF("id", "lon", "lat", "heading")
    val route = Seq((40.0, 40.0, 0), (40.5, 40.5, 1), (40.5, 41.0, 2))
      .toDF("rlon", "rlat", "seq")

    def search(meters: Double, tol: Double, bidir: Boolean): Set[String] =
      TrackOps.routeSearch(spark, features, "id", "lon", "lat", "heading",
          route, "rlon", "rlat", "seq", meters, tol, bidirectional = bidir)
        .select("id").as[String].collect().toSet

    val t0 = f0.map(_._1).toSet; val t1 = f1.map(_._1).toSet
    val t2 = f2.map(_._1).toSet; val t3 = f3.map(_._1).toSet
    assert(search(1000.0, 5.0, bidir = false) == t1)
    assert(search(1000.0, 15.0, bidir = false) == (t1 ++ t2))
    assert(search(100000.0, 5.0, bidir = false) == (t1 ++ t3))
    assert(search(1000.0, 5.0, bidir = true) == (t0 ++ t1))
  }

  test("tube select: the reference's simple geo + geo/time interpolation cases (TubeSelectProcessTest)") {
    // TubeSelectProcessTest.scala:95-180 — tube on type 'a' (45,45)..
    // (48,48) @ t0; search features type 'b' at the SAME positions @ t0
    // and type 'c' at the same positions a day later. maxSpeed 1 m/s x
    // maxTime 1 s -> ~1 m buffer, 1 s time slack. Expect exactly the 4
    // 'b' rows both with and without the time-displaced 'c' rows.
    graft.functions.StFunctions.register(spark)
    val t0 = 1293840000000L // 2011-01-01T00:00:00Z
    val track = Seq(45.0, 46.0, 47.0, 48.0).zipWithIndex
      .map { case (v, i) => (v, v, t0 + i) }.toDF("tlon", "tlat", "tms")
    def feats(types: Seq[(String, Long)]) =
      (for { (n, t) <- types; v <- Seq(45.0, 46.0, 47.0, 48.0) }
        yield (s"$n$v", v, v, t)).toDF("id", "lon", "lat", "ms")

    val bOnly = TrackOps.tubeSelect(spark, feats(Seq("b" -> t0)), "id", "lon", "lat", "ms",
      track, "tlon", "tlat", "tms", bufferMeters = 1.0, timeSlackMs = 1000L)
    assert(bOnly.count() == 4)

    val bAndC = TrackOps.tubeSelect(spark,
      feats(Seq("b" -> t0, "c" -> (t0 + 86400000L))), "id", "lon", "lat", "ms",
      track, "tlon", "tlat", "tms", bufferMeters = 1.0, timeSlackMs = 1000L)
    val ids = bAndC.select("id").as[String].collect().toSet
    assert(ids.size == 4 && ids.forall(_.startsWith("b")), ids)
  }

  test("tube select: a single-point tube still selects (reference tubes on in('a1'))") {
    // TubeSelectProcessTest.scala:55-93 — a one-feature tube collection
    // must produce results; an EMPTY tube collection must not
    graft.functions.StFunctions.register(spark)
    val t0 = 1293840000000L
    val onePoint = Seq((45.0, 45.0, t0)).toDF("tlon", "tlat", "tms")
    val searches = Seq(("b1", 45.0, 45.0, t0), ("b2", 46.0, 46.0, t0))
      .toDF("id", "lon", "lat", "ms")
    val got = TrackOps.tubeSelect(spark, searches, "id", "lon", "lat", "ms",
      onePoint, "tlon", "tlat", "tms", bufferMeters = 1.0, timeSlackMs = 1000L)
    assert(got.select("id").as[String].collect().toSeq == Seq("b1"))

    val empty = TrackOps.tubeSelect(spark, searches, "id", "lon", "lat", "ms",
      onePoint.where(lit(false)), "tlon", "tlat", "tms", 1.0, 1000L)
    assert(empty.count() == 0)
  }

  test("point2point: the reference's pair fixtures, segment order and time windows (Point2PointProcessTest)") {
    // Point2PointProcessTest.scala:41-119 — 'first' walks (1 1)..(5 5)
    // on Aug 1-5; 'second' walks (10 10)..(6 6) on the same days; 8
    // pairs total, each with [dtg_start, dtg_end] = the pair's days
    val mk = (0 until 5).flatMap { i =>
      Seq(("first", 1.0 + i, 1.0 + i, s"2015-08-0${i + 1}"),
        ("second", 10.0 - i, 10.0 - i, s"2015-08-0${i + 1}"))
    }
    val df = mk.toDF("myid", "lon", "lat", "d")
      .withColumn("dtg", to_timestamp(col("d"))).drop("d")

    val res = TrackOps.point2point(df, "myid", "lon", "lat", "dtg")
    assert(res.count() == 8)
    val first = res.where(col("myid") === "first")
      .orderBy("dtg_start")
      .select("x0", "y0", "x1", "y1").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(first == (1 to 4).map(i => (i.toDouble, i.toDouble, i + 1.0, i + 1.0)))
    val second = res.where(col("myid") === "second")
      .orderBy("dtg_start")
      .select("x0", "x1").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(second == Seq((10.0, 9.0), (9.0, 8.0), (8.0, 7.0), (7.0, 6.0)))
    // line geometries are real LineStrings over the pair
    val g = G.fromWkb(res.where(col("myid") === "first").orderBy("dtg_start")
      .select("geom").head.getAs[Array[Byte]](0))
    assert(g.toText == "LINESTRING (1 1, 2 2)")

    // empty input stays empty; groups at or below minPoints drop entirely
    assert(TrackOps.point2point(df.where(lit(false)), "myid", "lon", "lat", "dtg").count() == 0)
    assert(TrackOps.point2point(df.where(col("lon") <= 2), "myid", "lon", "lat", "dtg",
      minPoints = 2).count() == 0) // 'first' has exactly 2 pts: 2 > 2 is false

    // breakOnDay splits: shift 'first''s last two points to the same day
    val shifted = mk.map { case (id, x, y, d) =>
      val nd = if (id == "first" && x >= 4) "2015-08-09" else d
      (id, x, y, nd)
    }.toDF("myid", "lon", "lat", "d")
      .withColumn("dtg", to_timestamp(col("d"))).drop("d")
    val broke = TrackOps.point2point(shifted, "myid", "lon", "lat", "dtg", breakOnDay = true)
    // each UTC day is its own track and one-point days drop (reference
    // Point2PointProcess.scala:80-85): 'first' keeps only the two-point
    // day 9 -> 1 pair; 'second' has one point per day -> nothing
    assert(broke.where(col("myid") === "first").count() == 1)
    assert(broke.where(col("myid") === "second").count() == 0)

    // filterSingularPoints drops zero-length segments
    val dup = (mk :+ ("first", 5.0, 5.0, "2015-08-06")).toDF("myid", "lon", "lat", "d")
      .withColumn("dtg", to_timestamp(col("d"))).drop("d")
    assert(TrackOps.point2point(dup, "myid", "lon", "lat", "dtg").count() == 8)
    assert(TrackOps.point2point(dup, "myid", "lon", "lat", "dtg",
      filterSingularPoints = false).count() == 9)
  }

  test("track label: one representative per track, the latest when sorted (TrackLabelProcessTest)") {
    // TrackLabelProcessTest.scala:29-53 — 10 features on 2 tracks added
    // in random order; sorted by dtg the labels are features 8 and 9
    val rows = scala.util.Random.shuffle((0 until 10).map { i =>
      (i.toString, s"t-${i % 2}", s"2017-05-24T00:00:0$i.000Z", 45.0, 50.0 + i)
    }.toList)
    val df = rows.toDF("fid", "track", "d", "lon", "lat")
      .withColumn("dtg", to_timestamp(col("d"))).drop("d")
    val unsorted = TrackOps.trackLabel(df, "track")
    assert(unsorted.count() == 2)
    assert(unsorted.select("track").as[String].collect().toSet == Set("t-0", "t-1"))
    val sorted = TrackOps.trackLabel(df, "track", Some("dtg"))
    assert(sorted.select("fid").as[String].collect().toSet == Set("8", "9"))
  }

  test("proximity search: pair count flips 0 -> 6 at the 99 m boundary (ProximitySearchProcessTest)") {
    // data: a/b copies at (45,45)..(48,48); queries planted 99 m east of
    // the first three anchors in OUR spherical metric (binary search)
    val data = (for {
      name <- Seq("a", "b"); v <- Seq(45.0, 46.0, 47.0, 48.0)
    } yield (s"$name$v", v, v)).toDF("id", "lon", "lat")
      .selectExpr("id", "st_makePoint(lon, lat) AS geom")

    def eastAt(lon: Double, lat: Double, meters: Double): Double = {
      var lo = 0.0; var hi = 0.01
      val from = G.point(lon, lat)
      (0 until 60).foreach { _ =>
        val mid = (lo + hi) / 2
        if (G.distanceSphereMeters(from, G.point(lon + mid, lat)) < meters) lo = mid else hi = mid
      }
      lon + (lo + hi) / 2
    }
    graft.functions.StFunctions.register(spark)
    val queries = Seq(45.0, 46.0, 47.0).map(v => (s"q$v", eastAt(v, v, 99.0), v))
      .toDF("qid", "qlon", "qlat")
      .selectExpr("qid", "st_makePoint(qlon, qlat) AS qgeom")

    def pairs(radius: Double): Long =
      SpatialJoin.dwithin(queries, "qgeom", data, "geom", radius, res = 9).count()

    assert(pairs(50.0) == 0)
    assert(pairs(90.0) == 0)
    assert(pairs(99.1) == 6)
    assert(pairs(100.0) == 6)
    assert(pairs(101.0) == 6)
  }

  // SamplingProcessTest.scala:40-49 — 10 features (id "0".."9", track
  // t-(i%2)); .2 keeps exactly features 0 and 5; .5 threaded by track
  // keeps 0,1,4,5,8,9 (every-nth per key in id order)
  test("SamplingProcess fixture: global and per-track every-nth sampling") {
    import graft.{GraftQuery, QueryRunner}
    val df = (0 until 10).map { i =>
      (i.toString, s"t-${i % 2}", 45.0, 50.0 + i)
    }.toDF("id", "track", "lon", "lat")
    def ids(q: GraftQuery): Set[String] =
      QueryRunner.run(df, q, idColumn = "id")
        .select("id").collect().map(_.getString(0)).toSet
    assert(ids(GraftQuery(sampling = Some(0.2))) == Set("0", "5"))
    assert(ids(GraftQuery(sampling = Some(0.5), sampleBy = Some("track"))) ==
      Set("0", "1", "4", "5", "8", "9"))
  }

  // UniqueProcessTest.scala:42-59 + MinMaxProcessTest.scala:40-52 — the
  // same 10-feature fixture through the composed Query surface (CQL
  // temporal filter + Stat DSL), asserting the reference's exact values
  test("Unique and MinMax process fixtures via CQL + Stat DSL") {
    import graft.{GraftQuery, QueryRunner}
    import java.sql.Timestamp
    import java.time.Instant
    val df = (0 until 10).map { i =>
      (i.toString, s"t-${i % 2}",
        Timestamp.from(Instant.parse(s"2017-05-24T00:00:0$i.000Z")), 45.0, 50.0 + i)
    }.toDF("id", "track", "dtg", "lon", "lat")
    def enumOf(q: GraftQuery): Map[String, Long] =
      QueryRunner.run(df, q, idColumn = "id")
        .head().getAs[Map[String, Long]]("track_enumeration")
    // unique values with counts
    assert(enumOf(GraftQuery(statsString = Some("Enumeration(track)"))) ==
      Map("t-0" -> 5L, "t-1" -> 5L))
    // with the reference's BEFORE filter: three of each remain
    assert(enumOf(GraftQuery(cql = "dtg BEFORE 2017-05-24T00:00:05.001Z",
      statsString = Some("Enumeration(track)"))) == Map("t-0" -> 3L, "t-1" -> 3L))
    // MinMax over dates and strings: min/max/cardinality
    val d = QueryRunner.run(df, GraftQuery(statsString = Some("MinMax(dtg)")), idColumn = "id").head()
    assert(d.getAs[Timestamp]("dtg_min") == Timestamp.from(Instant.parse("2017-05-24T00:00:00Z")))
    assert(d.getAs[Timestamp]("dtg_max") == Timestamp.from(Instant.parse("2017-05-24T00:00:09Z")))
    assert(d.getAs[Long]("dtg_cardinality") == 10L)
    val t = QueryRunner.run(df, GraftQuery(statsString = Some("MinMax(track)")), idColumn = "id").head()
    assert(t.getAs[String]("track_min") == "t-0" && t.getAs[String]("track_max") == "t-1")
    assert(t.getAs[Long]("track_cardinality") == 2L)
  }

  // QueryProcessTest.scala:42-61 — the reference's exact filter strings
  // and transform projections over the same fixture
  test("QueryProcess fixture: CQL filters and transforms") {
    import graft.{GraftQuery, QueryRunner}
    import org.apache.spark.sql.DataFrame
    val df = (0 until 10).map { i =>
      (i.toString, s"t-${i % 2}", 45.0, 50.0 + i)
    }.toDF("id", "track", "lon", "lat")
    val geomProp = Map("geom" -> expr("st_makePoint(lon, lat)"))
    def run(q: GraftQuery): DataFrame = QueryRunner.run(df, q, geomProp, "id")
    def ids(cql: String): Set[String] =
      run(GraftQuery(cql = cql)).select("id").collect().map(_.getString(0)).toSet
    assert(ids("track = 't-1'") == Set("1", "3", "5", "7", "9"))
    assert(ids("bbox(geom,44,49,46,52)") == Set("0", "1", "2")) // lat 50+i in [49,52]
    assert(run(GraftQuery(cql = "INCLUDE")).count() == 10)
    val p2 = run(GraftQuery(cql = "track = 't-1'", transforms = Seq("track", "geom")))
    assert(p2.columns.toSeq == Seq("track", "geom") && p2.count() == 5)
    val p1 = run(GraftQuery(cql = "track = 't-1'", transforms = Seq("geom")))
    assert(p1.columns.toSeq == Seq("geom") && p1.count() == 5)
  }

  // ---- StatsProcessTest.scala:21-51 ------------------------------------
  // 10 features: track t-0/t-1 alternating, dtg 2017-05-24T00:00:0i,
  // POINT(45 5i). The process runs a stat string over the collection,
  // optionally over TRANSFORMED properties ("m=strConcat('m:', track)").
  private lazy val statsProcDf = (0 until 10).map { i =>
    (i.toString, s"t-${i % 2}", s"2017-05-24T00:00:0$i.000Z", 45.0, 50.0 + i)
  }.toDF("id", "track", "dtg", "lon", "lat")

  test("StatsProcess fixture: Count() over the collection") {
    val r = StatDsl.parse(statsProcDf, "Count()").collect()(0)
    assert(r.getAs[Long]("count") == 10L) // {"count":10}
  }

  test("StatsProcess fixture: stat over a projected property (m=strConcat('m:',track))") {
    // the reference evaluates the stat against query-transform properties;
    // here the transform is a derived column ahead of the same stat
    val projected = statsProcDf.select(concat(lit("m:"), col("track")).as("m"))
    val r = StatDsl.parse(projected, "Enumeration(m)").collect()(0)
    // {"m:t-0":5,"m:t-1":5}
    assert(r.getAs[Map[String, Long]]("m_enumeration") == Map("m:t-0" -> 5L, "m:t-1" -> 5L))
  }

  // ---- BinConversionProcessTest.scala:28-88 -----------------------------
  // 10 features with two geometry and two date columns; trackId defaults
  // to the feature ID's hashCode, alternates come from named attributes,
  // and labels ride in 24-byte records.
  private lazy val binProcDf = (0 until 10).map { i =>
    (s"0$i", s"name$i", s"$i",
      s"2017-02-20T00:00:0$i.000Z", s"2017-02-21T00:00:0$i.000Z",
      40.0, 50.0 + i, 20.0, 30.0 + i)
  }.toDF("id", "name", "track", "dtg", "dtg2", "lon", "lat", "lon2", "lat2")

  private def binRoundTrip(dir: String, recordSize: Int): Seq[graft.sources.BinExport.EncodedValues] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val bytes = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".bin")).toSeq.sorted
      .flatMap(p => Files.readAllBytes(Paths.get(p)).toSeq).toArray
    graft.sources.BinExport.decodeAll(bytes, recordSize)
  }

  test("BinConversionProcess fixture: empty collection encodes to nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binproc").toString
    val n = graft.sources.BinExport.write(binProcDf.limit(0), dir, "id", "dtg", "lon", "lat")
    assert(n == 0L && binRoundTrip(dir, 16).isEmpty)
  }

  test("BinConversionProcess fixture: generic encoding (id hashCode, dtg, lonlat)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binproc").toString
    graft.sources.BinExport.write(binProcDf, dir, "id", "dtg", "lon", "lat")
    val decoded = binRoundTrip(dir, 16).map(v => ((v.trackId, v.dtg), (v.lat, v.lon))).toSet
    val expected = (0 until 10).map { i =>
      ((s"0$i".hashCode, java.time.Instant.parse(s"2017-02-20T00:00:0$i.000Z").toEpochMilli),
        ((50.0 + i).toFloat, 40.0f))
    }.toSet
    assert(decoded == expected)
  }

  test("BinConversionProcess fixture: alternate track/geom/dtg attributes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binproc").toString
    graft.sources.BinExport.write(binProcDf, dir, "name", "dtg2", "lon2", "lat2")
    val decoded = binRoundTrip(dir, 16).map(v => ((v.trackId, v.dtg), (v.lat, v.lon))).toSet
    val expected = (0 until 10).map { i =>
      ((s"name$i".hashCode, java.time.Instant.parse(s"2017-02-21T00:00:0$i.000Z").toEpochMilli),
        ((30.0 + i).toFloat, 20.0f))
    }.toSet
    assert(decoded == expected)
  }

  test("BinConversionProcess fixture: labeled 24-byte records") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binproc").toString
    graft.sources.BinExport.write(binProcDf, dir, "id", "dtg", "lon", "lat", label = Some("track"))
    val decoded = binRoundTrip(dir, 24)
      .map(v => (((v.trackId, v.dtg), (v.lat, v.lon)), v.label)).toSet
    val expected = (0 until 10).map { i =>
      (((s"0$i".hashCode, java.time.Instant.parse(s"2017-02-20T00:00:0$i.000Z").toEpochMilli),
        ((50.0 + i).toFloat, 40.0f)),
        graft.sources.BinExport.labelToLong(s"$i"))
    }.toSet
    assert(decoded == expected)
  }

  // JoinProcessTest.scala:25-62 — sft1 "track,age,weight,dtg,geom:LineString",
  // sft2 "track:index=join,dtg,geom:Point"; 10 primaries, 100 secondaries
  // with track = i/10
  private lazy val joinPrimary = (0 until 10).map { i =>
    (i.toString, i.toString, i, i, java.sql.Timestamp.from(java.time.Instant.parse("2015-01-01T00:00:00Z")),
      G.toWkb(new org.locationtech.jts.io.WKTReader().read("LINESTRING(0 0, 1 1)")))
  }.toDF("fid", "track", "age", "weight", "dtg", "geom")
  private lazy val joinSecondary = (0 until 100).map { i =>
    (i.toString, (i / 10).toString, java.sql.Timestamp.from(java.time.Instant.parse("2015-01-01T00:00:00Z")),
      G.toWkb(new org.locationtech.jts.io.WKTReader().read("POINT(0 0)")))
  }.toDF("fid", "track", "dtg", "geom")

  test("JoinProcess fixture: join between schemas (age = 5 -> 10 track-5 rows)") {
    val primary = joinPrimary.where(graft.plans.Cql.parse("age = 5"))
    val out = Transforms.joinProcess(primary, joinSecondary, "track")
    val rows = out.collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[String]("track") == "5"))
    // combined-schema naming: join attr bare, everything else qualified,
    // primary attributes first (JoinProcess.getCombinedSft default)
    assert(out.columns.head === "track")
    assert(out.columns.contains("primary.age") && out.columns.contains("secondary.dtg"))
    assert(out.columns.indexOf("primary.age") < out.columns.indexOf("secondary.fid"))
  }

  test("JoinProcess: joinFilter applies to the secondary side; attributes project") {
    val primary = joinPrimary.where(graft.plans.Cql.parse("age = 5"))
    val out = Transforms.joinProcess(primary, joinSecondary, "track",
      joinFilter = Some("fid IN ('50','51','52')"),
      attributes = Seq("track", "primary.weight", "secondary.fid"))
    val rows = out.orderBy(col("`secondary.fid`")).collect()
    assert(out.columns.toSeq === Seq("track", "primary.weight", "secondary.fid"))
    assert(rows.map(_.getString(2)).toSeq === Seq("50", "51", "52"))
    assert(rows.forall(r => r.getString(0) == "5" && r.getInt(1) == 5))
  }

  test("JoinProcess: missing join attribute and the primary cap fail loudly") {
    assertThrows[IllegalArgumentException](
      Transforms.joinProcess(joinPrimary, joinSecondary, "nope"))
    assertThrows[IllegalArgumentException](
      Transforms.joinProcess(joinPrimary, joinSecondary, "track", maxPrimary = Some(5)))
  }
}
