package graft.table

import java.nio.file.Files

import graft.SparkTest
import graft.geom.GeomOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite

/**
 * Port of the reference's ZLineTest (geomesa-accumulo-datastore/src/
 * test/.../data/ZLineTest.scala:30-77 — a LineString feature through
 * the XZ3 spatio-temporal index) plus flat-XZ2 coverage for mixed
 * polygon/line geometries, over GeomTable.
 */
class GeomTableSpec extends AnyFunSuite with SparkTest {

  private def newRoot(): String = Files.createTempDirectory("graft-geom").toString

  private val reader = new WKTReader()
  private def wkb(wkt: String): Array[Byte] = GeomOps.toWkb(reader.read(wkt))

  private def millis(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  private lazy val zlineRoot: String = {
    val s = spark
    import s.implicits._
    val root = newRoot()
    val df = Seq(("fid1", "fred", "2015-01-01T12:00:00.000Z",
        "LINESTRING(47.28515625 25.576171875, 48 26, 49 27)"))
      .toDF("fid", "name", "dtgs", "wkt")
      .withColumn("dtg", to_timestamp(col("dtgs")))
      .withColumn("geom", udf((w: String) => wkb(w)).apply(col("wkt")))
      .select("fid", "name", "dtg", "geom")
    GeomTable.write(spark, df, root, "s1", dtgCol = Some("dtg"))
    root
  }

  private def zlineQuery(minx: Double, miny: Double, maxx: Double, maxy: Double): DataFrame =
    GeomTable.readBBoxTime(spark, zlineRoot, "s1", minx, miny, maxx, maxy,
      millis("2015-01-01T11:00:00Z"), millis("2015-01-01T13:00:00Z"))

  test("ZLine: a contained line is returned (bbox 47,25,50,28)") {
    val rows = zlineQuery(47, 25, 50, 28).collect()
    assert(rows.map(_.getAs[String]("fid")).toSeq === Seq("fid1"))
  }

  test("ZLine: an intersecting line is returned (bbox 47.5,25,49,26)") {
    val rows = zlineQuery(47.5, 25, 49, 26).collect()
    assert(rows.map(_.getAs[String]("fid")).toSeq === Seq("fid1"))
  }

  test("ZLine: a disjoint bbox returns nothing (bbox 45,24,46,25)") {
    assert(zlineQuery(45, 24, 46, 25).count() === 0)
  }

  test("ZLine: a disjoint time interval returns nothing") {
    assert(GeomTable.readBBoxTime(spark, zlineRoot, "s1", 47, 25, 50, 28,
      millis("2015-01-02T11:00:00Z"), millis("2015-01-02T13:00:00Z")).count() === 0)
  }

  test("ZLine: the same filter through the CQL surface agrees") {
    val cql = "bbox(geom,47,25,50,28) AND dtg DURING 2015-01-01T11:00:00.000Z/2015-01-01T13:00:00.000Z"
    val rows = GeomTable.queryCql(spark, zlineRoot, "s1", cql, idColumn = "fid").collect()
    assert(rows.map(_.getAs[String]("fid")).toSeq === Seq("fid1"))
  }

  test("flat XZ2 layout: mixed geometries, pruned scan matches brute force") {
    val s = spark
    import s.implicits._
    val root = newRoot()
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val x = -170 + rng.nextDouble() * 340
      val y = -80 + rng.nextDouble() * 160
      val w = rng.nextDouble() * 5
      val h = rng.nextDouble() * 5
      val wkt = i % 3 match {
        case 0 => s"POINT($x $y)"
        case 1 => s"LINESTRING($x $y, ${x + w} ${y + h})"
        case _ => s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))"
      }
      (s"f$i", wkb(wkt))
    }
    GeomTable.write(spark, rows.toDF("fid", "geom"), root, "s1")
    val q = (-40.0, -30.0, 25.0, 20.0)
    val pruned = GeomTable.readBBox(spark, root, "s1", q._1, q._2, q._3, q._4)
      .select("fid").collect().map(_.getString(0)).toSet
    val box = reader.read(
      s"POLYGON((${q._1} ${q._2}, ${q._3} ${q._2}, ${q._3} ${q._4}, ${q._1} ${q._4}, ${q._1} ${q._2}))")
    val brute = rows.filter { case (_, g) => GeomOps.fromWkb(g).intersects(box) }.map(_._1).toSet
    assert(pruned === brute)
    assert(brute.nonEmpty)
  }

  test("null and empty geometries are not indexed") {
    val s = spark
    import s.implicits._
    val root = newRoot()
    val df = Seq(
      ("a", wkb("POINT(1 1)")),
      ("b", null.asInstanceOf[Array[Byte]]),
      ("c", wkb("POLYGON EMPTY"))).toDF("fid", "geom")
    GeomTable.write(spark, df, root, "s1")
    assert(GeomTable.read(spark, root, "s1").count() === 1)
  }

  test("the xz ranges prune row groups: the scan filter carries xz BETWEENs") {
    val plan = GeomTable.readBBox(spark, zlineRootFlat, "s1", 0, 0, 10, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("xz") && (plan.contains("GreaterThanOrEqual(xz") || plan.contains("xz#")),
      s"expected xz range predicates in:\n$plan")
  }

  private lazy val zlineRootFlat: String = {
    val s = spark
    import s.implicits._
    val root = newRoot()
    GeomTable.write(spark,
      Seq(("p1", wkb("POINT(5 5)"))).toDF("fid", "geom"), root, "s1")
    root
  }

  test("readBBox/readBBoxTime plan against the written manifest, not caller defaults") {
    val s = spark
    import s.implicits._
    // non-default res and period: a reader trusting its own defaults
    // (res 12 / week) would build ranges at the wrong key base
    val flat = newRoot()
    GeomTable.write(spark, Seq(("a", wkb("POINT(5 5)"))).toDF("fid", "geom"),
      flat, "s1", res = 9)
    assert(GeomTable.manifest(spark, flat, "s1") === GeomTable.Manifest(9, "week", None))
    assert(GeomTable.readBBox(spark, flat, "s1", 0, 0, 10, 10).count() === 1)

    val temporal = newRoot()
    val t0 = java.sql.Timestamp.valueOf("2020-06-01 12:00:00")
    GeomTable.write(spark, Seq(("a", wkb("POINT(5 5)"), t0)).toDF("fid", "geom", "when"),
      temporal, "s1", dtgCol = Some("when"), res = 10, period = "day")
    assert(GeomTable.manifest(spark, temporal, "s1") ===
      GeomTable.Manifest(10, "day", Some("when")))
    val millis = t0.getTime
    assert(GeomTable.readBBoxTime(spark, temporal, "s1", 0, 0, 10, 10,
      millis - 1000, millis + 1000).count() === 1)
    // a snapshot without a dtg refuses temporal reads instead of
    // silently scanning a nonexistent layout
    intercept[IllegalArgumentException] {
      GeomTable.readBBoxTime(spark, flat, "s1", 0, 0, 10, 10, 0L, 1L)
    }
  }
}
