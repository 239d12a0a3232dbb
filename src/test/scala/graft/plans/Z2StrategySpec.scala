package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.functions.StFunctions
import graft.table.SpatialTable

/**
 * Port of the reference's Z2 index strategy fixture and its exact
 * feature-id assertions (/root/reference/geomesa-accumulo/
 * geomesa-accumulo-datastore/src/test/scala/.../index/
 * Z2IdxStrategyTest.scala:40-155): 30 deterministic features in 3
 * tracks at lon 40, lats 60-69 / 60-69 / 80-89. Unlike Z3StrategySpec
 * (which asserts the raw z-range cover), this runs the reference's
 * EXACT filter strings end-to-end: CQL text -> compiled predicate ->
 * SpatialTable indexed scan (pushdown + refine) -> id sets.
 */
class Z2StrategySpec extends AnyFunSuite {

  // dedicated session so the SpatialFilterRule extension is installed
  // (the shared test session lacks extensions; same pattern as
  // ExtensionsSpec)
  private lazy val spark: org.apache.spark.sql.SparkSession = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-z2-strategy-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    StFunctions.register(s)
    s
  }

  // ids 0-9:   track1, 2010-05-07T0i:00, POINT(40 6i)
  // ids 10-19: track2, 2010-05-{i}T{i}:00, POINT(40 6(i-10))
  // ids 20-29: track3, 2010-05-{i}T{i-10}:00, POINT(40 8(i-20))
  private lazy val features: Seq[(Int, String, String, java.sql.Timestamp, Double, Double)] = {
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    (0 until 10).map { i =>
      (i, s"name$i", "track1", ts(f"2010-05-07T$i%02d:00:00Z"), 40.0, 60.0 + i)
    } ++ (10 until 20).map { i =>
      (i, s"name$i", "track2", ts(f"2010-05-$i%02dT$i%02d:00:00Z"), 40.0, 60.0 + (i - 10))
    } ++ (20 until 30).map { i =>
      (i, s"name$i", "track3", ts(f"2010-05-$i%02dT${i - 10}%02d:00:00Z"), 40.0, 80.0 + (i - 20))
    }
  }

  private lazy val root: String = {
    StFunctions.register(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_z2strategy").toString
    val df = features.toDF("fid", "name", "track", "dtg", "lon", "lat")
    SpatialTable.write(spark, df, dir, "s1", "fid", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4)
    dir
  }

  private def ids(cql: String): Set[Int] = {
    import spark.implicits._
    SpatialTable.queryCql(spark, root, "s1", cql, idColumn = "fid")
      .select("fid").as[Int].collect().toSet
  }

  test("inclusive filter returns all of track1 (Z2IdxStrategyTest:77-82)") {
    assert(ids("bbox(geom, 35, 55, 45, 75) AND dtg between " +
      "'2010-05-07T00:00:00.000Z' and '2010-05-08T00:00:00.000Z'") == (0 to 9).toSet)
  }

  test("exclusive geom filter (Z2IdxStrategyTest:85-90)") {
    assert(ids("bbox(geom, 35, 55, 45, 65) AND dtg between " +
      "'2010-05-07T00:00:00.000Z' and '2010-05-08T00:00:00.000Z'") == (0 to 5).toSet)
  }

  test("exclusive date filter (Z2IdxStrategyTest:91-97)") {
    assert(ids("bbox(geom, 35, 55, 45, 75) AND dtg between " +
      "'2010-05-07T06:00:00.000Z' and '2010-05-08T00:00:00.000Z'") == (6 to 9).toSet)
  }

  test("whole world filter (Z2IdxStrategyTest:99-105)") {
    assert(ids("bbox(geom, -180, -90, 180, 90) AND dtg between " +
      "'2010-05-07T05:00:00.000Z' and '2010-05-07T08:00:00.000Z'") == (5 to 8).toSet)
  }

  test("small bboxes hit both coincident tracks (Z2IdxStrategyTest:107-112)") {
    assert(ids("bbox(geom, 39.999, 60.999, 40.001, 61.001)") == Set(1, 11))
  }

  test("secondary attribute filters refine (Z2IdxStrategyTest:114-121)") {
    assert(ids("bbox(geom, 35, 55, 45, 75) AND dtg between " +
      "'2010-05-07T06:00:00.000Z' and '2010-05-08T00:00:00.000Z'" +
      " AND name = 'name8'") == Set(8))
  }

  test("transforms project to the requested columns (Z2IdxStrategyTest:123-141)") {
    // transforms = column projection on Spark; functional transform =
    // the strConcat('my', name) derived column
    val df = SpatialTable.queryCql(spark, root, "s1",
      "bbox(geom, 35, 55, 45, 75) AND dtg between " +
        "'2010-05-07T06:00:00.000Z' and '2010-05-08T00:00:00.000Z'", idColumn = "fid")
      .select(col("fid"), concat(lit("my"), col("name")).as("derived"))
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSet == (6 to 9).toSet)
    assert(rows.forall(_.getString(1).matches("myname\\d")))
    assert(df.columns.toSeq == Seq("fid", "derived"))
  }

  test("the bbox conjunct prunes the indexed scan (fewer files than a full read)") {
    spark.conf.set("spark.graft.index.res", "9")
    val q = try {
      val d = SpatialTable.queryCql(spark, root, "s1",
        "bbox(geom, 39.999, 60.999, 40.001, 61.001)", idColumn = "fid")
      d.collect()
      d
    } finally spark.conf.unset("spark.graft.index.res")
    val pruned = q.queryExecution.executedPlan.collectLeaves().map(_.metrics
      .get("numFiles").map(_.value).getOrElse(0L)).sum
    val full = SpatialTable.read(spark, root, "s1")
    full.collect()
    val all = full.queryExecution.executedPlan.collectLeaves().map(_.metrics
      .get("numFiles").map(_.value).getOrElse(0L)).sum
    assert(pruned > 0 && all > 0 && pruned < all, s"pruned=$pruned all=$all")
  }
}
