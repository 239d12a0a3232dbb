package graft.plans

import java.nio.file.Files

import graft.SparkTest
import graft.geom.GeomOps
import graft.table.{GeomTable, SpatialTable}
import org.apache.spark.sql.functions._
import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite

/**
 * Ports the reference's index-configuration store fixtures:
 *
 *  - ZIntervalTest (accumulo-datastore data/ZIntervalTest.scala:25-90):
 *    the z3 time interval is configurable per type (day/week/month/year)
 *    and every setting must answer the same bbox+DURING filters exactly.
 *    Here the period is GeomTable's temporal-layout argument; each
 *    period produces different time_bin boundaries and XZ3 bit splits
 *    but identical answers.
 *  - XZConfigurationTest (accumulo-datastore index/XZConfigurationTest
 *    .scala:25-90): configurable XZ precision (10 instead of the default
 *    12) through both the XZ2 (bbox) and XZ3 (bbox+interval) layouts,
 *    with the reference's exact polygon fixture and expected id sets.
 *  - HighCardinalityAttributeOrQueryTest (:29-66): a wide OR / IN of
 *    attribute equalities AND'd with bbox + DURING through an indexed
 *    store returns every feature exactly once (the reference exercises
 *    its OR-splitting planner here; ours must answer identically through
 *    the CQL surface over a SpatialTable snapshot).
 */
class IndexConfigParitySpec extends AnyFunSuite with SparkTest {

  private val reader = new WKTReader(GeomOps.factory)
  private def wkb(wkt: String): Array[Byte] = GeomOps.toWkb(reader.read(wkt))
  private def millis(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  // ---- ZIntervalTest ---------------------------------------------------

  // 10 points POINT(-120 7i), dtg 2015-01-(i+1) 12:00
  private lazy val zIntervalDf = {
    val s = spark
    import s.implicits._
    (0 until 10).map { i =>
      (i.toString, java.sql.Timestamp.from(
        java.time.Instant.parse(f"2015-01-${i + 1}%02dT12:00:00.000Z")),
        wkb(s"POINT(-120 7$i)"))
    }.toDF("fid", "dtg", "geom")
  }

  private val zIntervalFilters = Seq(
    (("2015-01-01T00:00:00.000Z", "2015-01-12T00:00:00.000Z"), (0 until 10).map(_.toString)),
    (("2015-01-03T00:00:00.000Z", "2015-01-09T00:00:00.000Z"), (2 until 8).map(_.toString)),
    (("2015-01-01T11:59:59.999Z", "2015-01-01T12:00:00.001Z"), Seq("0")))

  for (period <- Seq("day", "week", "month", "year")) {
    test(s"ZInterval fixture: configurable time interval '$period' answers all filters") {
      val root = Files.createTempDirectory(s"graft-zint-$period").toString
      GeomTable.write(spark, zIntervalDf, root, "s1", dtgCol = Some("dtg"), period = period)
      for (((t0, t1), expected) <- zIntervalFilters) {
        val got = GeomTable.readBBoxTime(spark, root, "s1", -121, 69, -120, 80,
            millis(t0), millis(t1))
          .select("fid").collect().map(_.getString(0)).sorted.toSeq
        assert(got === expected.sorted, s"period=$period interval=$t0/$t1")
      }
    }
  }

  // ---- XZConfigurationTest ----------------------------------------------

  // 10 polygons POLYGON((40 3i, 42 3i, 42 2i, 40 2i, 40 3i)), dtg hour i
  private lazy val xzConfDf = {
    val s = spark
    import s.implicits._
    (0 until 10).map { i =>
      (i.toString, java.sql.Timestamp.from(
        java.time.Instant.parse(f"2010-05-07T$i%02d:00:00.000Z")),
        wkb(s"POLYGON((40 3$i, 42 3$i, 42 2$i, 40 2$i, 40 3$i))"))
    }.toDF("fid", "dtg", "geom")
  }

  test("XZConfiguration fixture: XZ2 at precision 10 (bbox 39,19,41,23 -> ids 0-3)") {
    val root = Files.createTempDirectory("graft-xzconf2").toString
    GeomTable.write(spark, xzConfDf, root, "s1", res = 10)
    val got = GeomTable.readBBox(spark, root, "s1", 39, 19, 41, 23)
      .select("fid").collect().map(_.getString(0).toInt).sorted.toSeq
    assert(got === (0 until 4))
  }

  test("XZConfiguration fixture: XZ3 at precision 10 (bbox + DURING -> ids 2-3)") {
    val root = Files.createTempDirectory("graft-xzconf3").toString
    GeomTable.write(spark, xzConfDf, root, "s1", dtgCol = Some("dtg"), res = 10)
    val got = GeomTable.readBBoxTime(spark, root, "s1", 39, 19, 41, 23,
        millis("2010-05-07T01:30:00.000Z"), millis("2010-05-07T05:30:00.000Z"))
      .select("fid").collect().map(_.getString(0).toInt).sorted.toSeq
    assert(got === Seq(2, 3))
  }

  // ---- HighCardinalityAttributeOrQueryTest -------------------------------

  test("HighCardinality fixture: wide attribute OR / IN AND bbox AND DURING returns all") {
    val s = spark
    import s.implicits._
    val n = 10
    val df = (0 until n).map { i =>
      (i.toString, s"h$i", s"l$i",
        java.sql.Timestamp.from(java.time.Instant.parse(f"2014-01-01T01:00:$i%02d.000Z")),
        45.0, 45.0 + i / 10.0)
    }.toDF("fid", "high", "low", "dtg", "lon", "lat")
    val root = Files.createTempDirectory("graft-highcard").toString
    SpatialTable.write(spark, df, root, "s1", "fid", "lon", "lat")
    SpatialTable.writeAttributeIndex(spark, root, "s1", "high", buckets = 4)

    val inQuery = s"high in (${(0 until n).map(i => s"'h$i'").mkString(", ")})"
    val orQuery = (0 until n).map(i => s"high = 'h$i'").mkString(" OR ")
    for (attrPart <- Seq(inQuery, orQuery)) {
      val cql = s"($attrPart) AND BBOX(geom, 40.0,40.0,50.0,50.0) AND " +
        "dtg DURING 2014-01-01T00:00:00+00:00/2014-01-01T23:59:59+00:00"
      val got = SpatialTable.queryCql(spark, root, "s1", cql, idColumn = "fid")
        .select("fid").collect().map(_.getString(0))
      assert(got.length === n, s"filter: $cql")
      assert(got.toSet === (0 until n).map(_.toString).toSet)
    }
    // the OR also splits into disjoint single-scan branches without
    // changing the answer (OrSplittingFilter -> makeDisjoint pipeline)
    val branches = Cql.splitOr(orQuery)
    assert(branches.length === n)
  }
}
