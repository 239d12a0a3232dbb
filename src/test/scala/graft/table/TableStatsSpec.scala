package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest

/** Cached stats semantics — AccumuloDataStoreStatsTest:49-390 ported:
  * defaults before collection, exact tracked bounds after writes,
  * mutation refresh, exact vs estimated counts, and the
  * collection-disable switch. */
class TableStatsSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def freshRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // the fixture's first two features: alpha@(0,0) age 10, cappa@(10,10)
  // age 12, dtgs 2016-01-04T00:00Z and T12:00Z
  private val fixture = Seq(
    ("id1", "alpha", 10L, 0.0, 0.0, "2016-01-04 00:00:00"),
    ("id2", "cappa", 12L, 10.0, 10.0, "2016-01-04 12:00:00"))

  private def fixtureDf = fixture.toDF("id", "name", "age", "lon", "lat", "dtg")
    .withColumn("dtg", col("dtg").cast("timestamp"))

  test("defaults before any collection: no count, whole-world bounds, no " +
    "attribute stats (StatsTest 'initially have global stats')") {
    val root = freshRoot("graft_stats0")
    SpatialTable.write(spark, fixtureDf.limit(0), root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 1)
    assert(TableStats.getCount(spark, root, "s1").isEmpty)
    assert(TableStats.getBounds(spark, root, "s1") == TableStats.WholeWorld)
    assert(TableStats.getAttributeBounds(spark, root, "s1", "name").isEmpty)
    assert(TableStats.getTopK(spark, root, "s1", "name").isEmpty)
  }

  test("collected stats answer without scanning: count, bounds, attribute " +
    "min/max, topk (StatsTest 'through feature writer append')") {
    val root = freshRoot("graft_stats1")
    SpatialTable.write(spark, fixtureDf, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 1)
    TableStats.collect(spark, root, "s1", Seq("name", "age", "dtg"))

    assert(TableStats.getCount(spark, root, "s1").contains(2L))
    assert(TableStats.getBounds(spark, root, "s1") == (0.0, 0.0, 10.0, 10.0))
    assert(TableStats.getAttributeBounds(spark, root, "s1", "name")
      .contains(("alpha", "cappa", 2L)))
    assert(TableStats.getAttributeBounds(spark, root, "s1", "age")
      .contains(("10", "12", 2L)))
    // timestamps render as UTC micros so bounds order correctly
    val dtg = TableStats.getAttributeBounds(spark, root, "s1", "dtg").get
    assert(dtg._1 == "1451865600000000" && dtg._2 == "1451908800000000")
    // untracked attribute: none
    assert(TableStats.getAttributeBounds(spark, root, "s1", "id").isEmpty)
    assert(TableStats.getTopK(spark, root, "s1", "name") ==
      Seq(("alpha", 1L), ("cappa", 1L)))

    // the cached read is metadata-only: stats answer even after the
    // data directory disappears
    val f = new java.io.File(s"$root/data")
    def nuke(d: java.io.File): Unit = {
      Option(d.listFiles).foreach(_.foreach(nuke)); d.delete()
    }
    nuke(f)
    assert(TableStats.getCount(spark, root, "s1").contains(2L))
    assert(TableStats.getBounds(spark, root, "s1") == (0.0, 0.0, 10.0, 10.0))
  }

  test("writeConfigured collects stats for indexed attributes + dtg; " +
    "geomesa.stats.enable='false' disables (StatsTest :364-388)") {
    val rootOn = freshRoot("graft_stats_on")
    val rootOff = freshRoot("graft_stats_off")
    val sftOn = Sft.parse("people",
      "id:String,name:String:index=true,age:Long,dtg:Date,*geom:Point:srid=4326")
    SpatialTable.writeConfigured(spark, fixtureDf, rootOn, "s1", sftOn, "id", "lon", "lat",
      res = 9, prefixRes = 3, partitions = 1)
    assert(TableStats.exists(spark, rootOn, "s1"))
    assert(TableStats.getCount(spark, rootOn, "s1").contains(2L))
    assert(TableStats.getAttributeBounds(spark, rootOn, "s1", "name").isDefined)
    assert(TableStats.getAttributeBounds(spark, rootOn, "s1", "dtg").isDefined)
    assert(TableStats.getAttributeBounds(spark, rootOn, "s1", "age").isEmpty) // not indexed

    val sftOff = Sft.parse("people",
      "id:String,name:String:index=true,age:Long,dtg:Date,*geom:Point:srid=4326;" +
        "geomesa.stats.enable='false'")
    SpatialTable.writeConfigured(spark, fixtureDf, rootOff, "s1", sftOff, "id", "lon", "lat",
      res = 9, prefixRes = 3, partitions = 1)
    assert(!TableStats.exists(spark, rootOff, "s1"))
    assert(TableStats.getCount(spark, rootOff, "s1").isEmpty)
  }

  test("mutations refresh the cached stats over the same tracked attributes " +
    "(StatsTest 'update all stats')") {
    val root = freshRoot("graft_stats2")
    SpatialTable.write(spark, fixtureDf, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 1)
    TableStats.collect(spark, root, "s1", Seq("name", "age"))

    // add gamma@(-10,-10): bounds expand, count bumps
    SpatialTable.upsert(spark, root, "s1", "s2",
      Seq(("id3", "gamma", 15L, -10.0, -10.0, "2016-01-05 00:00:00"))
        .toDF("id", "name", "age", "lon", "lat", "dtg")
        .withColumn("dtg", col("dtg").cast("timestamp")))
    assert(TableStats.getCount(spark, root, "s2").contains(3L))
    assert(TableStats.getBounds(spark, root, "s2") == (-10.0, -10.0, 10.0, 10.0))
    assert(TableStats.getAttributeBounds(spark, root, "s2", "name")
      .contains(("alpha", "gamma", 3L)))

    // a point INSIDE the bounds does not move them (StatsTest 'not
    // expand bounds when not necessary')
    SpatialTable.upsert(spark, root, "s2", "s3",
      Seq(("id4", "beta", 11L, 5.0, 5.0, "2016-01-04 06:00:00"))
        .toDF("id", "name", "age", "lon", "lat", "dtg")
        .withColumn("dtg", col("dtg").cast("timestamp")))
    assert(TableStats.getBounds(spark, root, "s3") == (-10.0, -10.0, 10.0, 10.0))

    // deletes: counts move EXACTLY, but bounds/min-max are writer-
    // maintained expand-only envelopes (the reference's MetadataBacked
    // Stats: a MinMax stat cannot un-see a removed value — deletes
    // decrement counts, an EXACT refresh is the explicit re-collect /
    // StatsScan path)
    SpatialTable.deleteWhere(spark, root, "s3", "s4", "name <> 'cappa'")
    assert(TableStats.getCount(spark, root, "s4").contains(1L))
    assert(TableStats.getBounds(spark, root, "s4") == (-10.0, -10.0, 10.0, 10.0))
    assert(TableStats.getAttributeBounds(spark, root, "s4", "name")
      .exists(_._3 == 1L))
    // the explicit re-collect is the exact path: bounds shrink to cappa
    TableStats.collect(spark, root, "s4", Seq("name", "age"))
    assert(TableStats.getBounds(spark, root, "s4") == (10.0, 10.0, 10.0, 10.0))
    assert(TableStats.getAttributeBounds(spark, root, "s4", "name")
      .contains(("cappa", "cappa", 1L)))
  }

  test("mutation deltas merge the stored HLL sketch: cardinality tracks the " +
    "UNION of old and added values, not a lower bound") {
    val root = freshRoot("graft_stats_hll")
    val base = (0 until 40).map(i => (s"f$i", s"name-${i % 20}", 10.0, 10.0))
      .toDF("id", "name", "lon", "lat")
    SpatialTable.write(spark, base, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 1)
    TableStats.collect(spark, root, "s1", Seq("name"))
    val st1 = TableStats.cached(spark, root, "s1").get
    assert(st1.attributes("name").hll.isDefined, "collect must store the sketch")
    assert(st1.attributes("name").cardinality == 20L) // exact at this size
    // upsert 10 rows with 10 BRAND-NEW names: union cardinality = 30.
    // The lower-bound fallback would report max(20, 10) = 20
    val ups = (0 until 10).map(i => (s"g$i", s"fresh-$i", 11.0, 11.0))
      .toDF("id", "name", "lon", "lat")
    SpatialTable.upsert(spark, root, "s1", "s2", ups)
    val st2 = TableStats.cached(spark, root, "s2").get
    assert(st2.attributes("name").cardinality == 30L,
      s"sketch union expected 30, got ${st2.attributes("name").cardinality}")
    assert(st2.attributes("name").hll.isDefined, "merged sketch must persist")
    assert(st2.attributes("name").count == 50L)
  }

  test("exact counts scan (optionally under CQL); estimates come from the " +
    "lineage metrics and bound the truth (StatsTest :286-312)") {
    val root = freshRoot("graft_stats3")
    val df = (0 until 200).map(i =>
      (s"f$i", s"name-${i % 5}", (i % 36) * 5.0 - 85.0, (i % 17) * 5.0 - 40.0))
      .toDF("id", "name", "lon", "lat")
    SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 2)
    TableStats.collect(spark, root, "s1", Seq("name"))

    assert(TableStats.getCount(spark, root, "s1").contains(200L))
    assert(TableStats.getCount(spark, root, "s1", exact = true).contains(200L))
    assert(TableStats.getCount(spark, root, "s1", exact = true,
      cql = Some("name = 'name-0'")).contains(40L))

    // spatial estimate: superset of the exact bbox count, zero when the
    // box misses every data directory
    val bbox = (-20.0, -20.0, 20.0, 20.0)
    val exact = SpatialTable.readBBox(spark, root, "s1", bbox).count()
    val est = TableStats.estimateCount(spark, root, "s1", bbox)
    assert(est >= exact && exact > 0)
    assert(TableStats.estimateCount(spark, root, "s1", (150.0, 80.0, 179.0, 89.0)) == 0L)
    // world box: estimate equals the full count
    assert(TableStats.estimateCount(spark, root, "s1", TableStats.WholeWorld) == 200L)
  }
}
