package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.functions.StFunctions
import graft.geom.GeomOps

class StatsSpec extends AnyFunSuite with SparkTest {

  private lazy val ready: Unit = StFunctions.register(spark)

  test("convex hull aggregate contains all inputs and is their hull") {
    ready
    import spark.implicits._
    val pts = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (2.0, 2.0), (1.0, 3.0))
      .toDF("x", "y").selectExpr("st_makePoint(x, y) AS g")
    val hullWkb = pts.agg(Stats.convexHull(col("g"))).head.getAs[Array[Byte]](0)
    val hull = GeomOps.fromWkb(hullWkb)
    assert(hull.getGeometryType == "Polygon")
    assert(hull.getArea == 16.0) // the 4x4 square; interior points absorbed
  }

  test("convex hull is null-tolerant and merge-associative across partitions") {
    ready
    import spark.implicits._
    val pts = (0 until 100).map(i => (math.cos(i * 0.063) * 10, math.sin(i * 0.063) * 10))
      .toDF("x", "y").repartition(7).selectExpr("st_makePoint(x, y) AS g")
    val hull = GeomOps.fromWkb(pts.agg(Stats.convexHull(col("g"))).head.getAs[Array[Byte]](0))
    assert(math.abs(hull.getArea - math.Pi * 100) / (math.Pi * 100) < 0.05) // ~circle
  }

  test("union aggregate: binary-counter buffer stays logarithmic, result exact") {
    ready
    import spark.implicits._
    // 4000 disjoint unit boxes on an integer grid: union area must be
    // exactly 4000 (no FP slack) and the reduce-side buffer must stay
    // O(log n) — the direct regression test for the quadratic
    // incremental-union hang found at sf0.1
    var buf = Stats.UnionAgg.zero
    (0 until 4000).foreach { i =>
      val g = GeomOps.fromWkt(
        s"POLYGON((${i * 2} 0, ${i * 2 + 1} 0, ${i * 2 + 1} 1, ${i * 2} 1, ${i * 2} 0))")
      buf = Stats.UnionAgg.reduce(buf, GeomOps.toWkb(g))
      assert(buf.size <= 13, s"buffer grew to ${buf.size} at $i")
    }
    val u = GeomOps.fromWkb(Stats.UnionAgg.finish(buf))
    assert(u.getArea == 4000.0)
    // distributed path agrees
    val df = (0 until 500).map(i =>
      s"POLYGON((${i * 2} 0, ${i * 2 + 1} 0, ${i * 2 + 1} 1, ${i * 2} 1, ${i * 2} 0))")
      .toDF("wkt").repartition(9).selectExpr("st_geomFromWKT(wkt) AS g")
    val area = GeomOps.fromWkb(
      df.agg(Stats.geomUnion(col("g"))).head.getAs[Array[Byte]](0)).getArea
    assert(area == 500.0)
  }

  test("envelope aggregate") {
    ready
    import spark.implicits._
    val df = Seq((1.0, 2.0), (-3.0, 8.0), (5.0, -1.0)).toDF("x", "y")
      .selectExpr("st_makePoint(x, y) AS g")
    val r = Stats.envelopeAgg(df, "g").head
    assert(r.getDouble(0) == -3.0 && r.getDouble(1) == -1.0 && r.getDouble(2) == 5.0 && r.getDouble(3) == 8.0)
  }

  test("descriptive stats + minmax cardinality + topK + histogram") {
    ready
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val d = Stats.descriptive(df, Seq("v")).head
    assert(d.getAs[Long]("v_count") == 100 && d.getAs[Double]("v_mean") == 50.5)
    val mm = Stats.minMaxCardinality(df, "v").head
    assert(mm.getAs[Double]("min") == 1.0 && mm.getAs[Double]("max") == 100.0)
    assert(math.abs(mm.getAs[Long]("approx_cardinality") - 100) <= 5)
    val hist = Stats.histogram(df, "v", 0, 100, 10).collect()
    assert(hist.map(_.getAs[Long]("count")).sum == 100)
    val tk = Stats.topK(df.withColumn("k", col("v") > 50), "k", 1).head
    assert(tk.getAs[Long]("count") == 50)
  }

  test("z3Histogram keys by (time bin, cell)") {
    ready
    import spark.implicits._
    val df = Seq(
      (0.0, 0.0, 1273190400000L), (0.1, 0.1, 1273190400000L),
      (50.0, 50.0, 1274000000000L)).toDF("lon", "lat", "millis")
    val h = Stats.z3Histogram(df, "lon", "lat", "millis", "week", 5).collect()
    assert(h.map(_.getAs[Long]("count")).sum == 3)
    assert(h.length == 2) // two (bin, cell) groups
  }

  test("bin records projection is 16-byte-shaped (int,int,float,float)") {
    ready
    import spark.implicits._
    val df = Seq(("t1", 1273190400000L, 10.5, 45.25)).toDF("track", "millis", "lon", "lat")
    val b = Stats.binRecords(df, "track", "millis", "lon", "lat")
    assert(b.schema.fields.map(_.dataType.simpleString).toSeq ==
      Seq("int", "int", "float", "float"))
    val r = b.head
    assert(r.getInt(1) == (1273190400000L / 1000).toInt)
    assert(r.getFloat(3) == 10.5f && r.getFloat(2) == 45.25f)
  }

  test("count-min sketch builds and partition count is positive") {
    ready
    import spark.implicits._
    val df = (1 to 1000).map(i => s"k${i % 17}").toDF("k")
    val cms = Stats.countMinSketch(df, "k").head.getAs[Array[Byte]](0)
    assert(cms != null && cms.nonEmpty)
    assert(Stats.partitionCount(df) >= 1)
  }

  test("z3Frequency: per-bin count-min sketch answers hot-cell queries") {
    import spark.implicits._
    // 200 points in one hot cell during bin of week 0, 50 spread out
    val rows = (0 until 200).map(i => (10.0, 45.0, 1000L * i)) ++
      (0 until 50).map(i => (i.toDouble, -i / 2.0, 700L * 3600 * 1000 + i))
    val df = rows.toDF("lon", "lat", "millis")
    val out = Stats.z3Frequency(df, "lon", "lat", "millis", "week", 6).collect()
    assert(out.length == 2) // two week bins
    val hotBin = out.maxBy(_.getAs[Long]("n"))
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(hotBin.getAs[Array[Byte]]("cms")))
    val hotCell = graft.cells.Cells.cell(10.0, 45.0, 6)
    assert(cms.estimateCount(hotCell) >= 200) // CMS overestimates only
  }

  test("covariance matrix: pairwise covar/corr in one pass") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0))
      .toDF("x", "y", "z")
    val r = Stats.covarianceMatrix(df, Seq("x", "y", "z")).head
    assert(math.abs(r.getAs[Double]("corr_x_y") - 1.0) < 1e-12)   // y = 2x
    assert(math.abs(r.getAs[Double]("corr_x_z") + 1.0) < 1e-12)   // z = -x
    assert(math.abs(r.getAs[Double]("cov_x_y") - 2 * r.getAs[Double]("cov_x_z").abs / 1.0) < 1e-9 ||
      r.getAs[Double]("cov_x_y") > 0)
    val expectedCovXY = 10.0 / 3.0 // var_samp(x) * 2 with x=1..4: var=5/3 -> cov=10/3
    assert(math.abs(r.getAs[Double]("cov_x_y") - expectedCovXY) < 1e-9)
  }

  test("map aggregation: per-group value->count map") {
    import spark.implicits._
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "c")).toDF("g", "v")
    val out = Stats.mapCounts(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(out == Map("g1" -> Map("a" -> 2L, "b" -> 1L), "g2" -> Map("c" -> 1L)))
    // null values are dirty data, not a crash (null can't be a map key)
    val dirty = Seq(("g1", "a"), ("g1", null.asInstanceOf[String])).toDF("g", "v")
    val m = Stats.mapCounts(dirty, "g", "v").collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(m == Map("g1" -> Map("a" -> 1L)))
  }

  test("dateHistogram: column plan matches the LongBins kernel row-for-row") {
    import spark.implicits._
    val lo = java.time.Instant.parse("2016-01-01T00:00:00Z").toEpochMilli
    val hi = java.time.Instant.parse("2016-01-01T10:00:00Z").toEpochMilli
    // values on and around every edge, plus out-of-range rows to drop
    val millis = (0 until 600 by 7).map(m => lo + m * 60000L) ++
      Seq(lo - 1, hi, hi + 1, lo, lo + 1)
    val df = millis.map(m => new java.sql.Timestamp(m)).toDF("ts")
    val got = Binned.dateHistogram(df, "ts", lo, hi, 10).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("count"),
        r.getAs[Long]("median_millis"), r.getAs[Long]("lo_millis"), r.getAs[Long]("hi_millis")))
    val kernel = Binned.LongBins(10, lo, hi)
    val expected = millis.map(kernel.indexOf).filter(_ >= 0)
      .groupBy(identity).toSeq.sortBy(_._1)
      .map { case (b, vs) =>
        (b, vs.size.toLong, kernel.medianValue(b), kernel.boundsOf(b)._1, kernel.boundsOf(b)._2) }
    assert(got.toSeq == expected)
  }
}
