package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.cells.BinnedTime
import graft.functions.StFunctions

/**
 * Port of the reference's Z3 index strategy fixture and its exact
 * feature-id assertions (/root/reference/geomesa-accumulo/
 * geomesa-accumulo-datastore/src/test/scala/.../index/
 * Z3IdxStrategyTest.scala:40-158; FIXTURES.md §2): 30 deterministic
 * features in 3 tracks; bbox x interval queries must return the exact
 * id sets — via the coarse z3 range cover (which must be a superset:
 * cover soundness) followed by the exact refine (Z3Filter analog).
 */
class Z3StrategySpec extends AnyFunSuite with SparkTest {

  private def ts(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  // ids 0-9:   track1, 2010-05-07T0i:00, POINT(4i 60)   (lon 40..49)
  // ids 10-19: track2, 2010-05-{i}T{i}:00, POINT(4(i-10) 60)
  // ids 20-29: track3, 2010-05-{i}T{i-10}:00, POINT(6(i-20) 60)
  private lazy val features: Seq[(Int, String, Long, Double, Double)] =
    (0 until 10).map { i =>
      (i, "track1", ts(f"2010-05-07T$i%02d:00:00Z"), 40.0 + i, 60.0)
    } ++ (10 until 20).map { i =>
      (i, "track2", ts(f"2010-05-${i}%02dT$i%02d:00:00Z"), 40.0 + (i - 10), 60.0)
    } ++ (20 until 30).map { i =>
      (i, "track3", ts(f"2010-05-$i%02dT${i - 10}%02d:00:00Z"), 60.0 + (i - 20), 60.0)
    }

  private def run(bbox: (Double, Double, Double, Double),
                  start: String, end: String): (Set[Int], Set[Int]) = {
    StFunctions.register(spark)
    import spark.implicits._
    val df = features.toDF("fid", "track", "millis", "lon", "lat")
      .withColumn("bin", expr("st_z3bin(millis, 'week')"))
      .withColumn("z", expr("st_z3(st_makePoint(lon, lat), millis, 'week')"))
    val (s, e) = (ts(start), ts(end) - 1) // during: exclusive upper bound
    val coarseCol = ZQuery.z3Filter(col("bin"), col("z"), bbox, s, e, BinnedTime.Week)
    val coarse = df.where(coarseCol)
    val exact = coarse.where(
      col("lon").between(bbox._1, bbox._3) && col("lat").between(bbox._2, bbox._4) &&
        col("millis").between(s, e))
    (coarse.select("fid").as[Int].collect().toSet,
      exact.select("fid").as[Int].collect().toSet)
  }

  test("bbox(38,59,51,61) x [05-07, 05-08) -> ids 0-9 (Z3IdxStrategyTest:95-102)") {
    val (coarse, exact) = run((38, 59, 51, 61), "2010-05-07T00:00:00Z", "2010-05-08T00:00:00Z")
    assert(exact == (0 until 10).toSet)
    assert(coarse.subsetOf(features.map(_._1).toSet) && (0 until 10).toSet.subsetOf(coarse))
  }

  test("bbox(38,59,45,61) x [05-07, 05-08) -> ids 0-5 (Z3IdxStrategyTest:103-110)") {
    val (_, exact) = run((38, 59, 45, 61), "2010-05-07T00:00:00Z", "2010-05-08T00:00:00Z")
    assert(exact == (0 to 5).toSet)
  }

  test("multi-week interval picks up track2 (week-boundary variant)") {
    val (_, exact) = run((38, 59, 51, 61), "2010-05-07T00:00:00Z", "2010-05-21T00:00:00Z")
    assert(exact == (0 until 20).toSet)
  }

  test("whole world x full month -> all 30") {
    val (_, exact) = run((-180, -90, 180, 90), "2010-05-01T00:00:00Z", "2010-06-01T00:00:00Z")
    assert(exact == (0 until 30).toSet)
  }

  test("disjoint bbox -> empty") {
    val (_, exact) = run((-10, -10, 10, 10), "2010-05-07T00:00:00Z", "2010-05-08T00:00:00Z")
    assert(exact.isEmpty)
  }

  test("track3-only box") {
    val (_, exact) = run((59.5, 59, 70, 61), "2010-05-01T00:00:00Z", "2010-06-01T00:00:00Z")
    assert(exact == (20 until 30).toSet)
  }

  test("coarse z3 cover selectivity: far-away box prunes most rows") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = features.toDF("fid", "track", "millis", "lon", "lat")
      .withColumn("bin", expr("st_z3bin(millis, 'week')"))
      .withColumn("z", expr("st_z3(st_makePoint(lon, lat), millis, 'week')"))
    val coarse = ZQuery.z3Filter(col("bin"), col("z"), (-170, -80, -160, -70),
      ts("2010-05-07T00:00:00Z"), ts("2010-05-08T00:00:00Z") - 1, BinnedTime.Week)
    assert(df.where(coarse).count() == 0)
  }

  test("z3FilterFn (function form) selects exactly the same rows as z3Filter") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = features.toDF("fid", "track", "millis", "lon", "lat")
      .withColumn("bin", expr("st_z3bin(millis, 'week')"))
      .withColumn("z", expr("st_z3(st_makePoint(lon, lat), millis, 'week')"))
    val (s, e) = (ts("2010-05-07T00:00:00Z"), ts("2010-05-21T00:00:00Z") - 1)
    for (bbox <- Seq((38.0, 59.0, 51.0, 61.0), (-180.0, -90.0, 180.0, 90.0), (-10.0, -10.0, 10.0, 10.0))) {
      val expr1 = df.where(ZQuery.z3Filter(col("bin"), col("z"), bbox, s, e, BinnedTime.Week))
        .select("fid").as[Int].collect().toSet
      val fn = df.where(ZQuery.z3FilterFn(col("bin"), col("z"), bbox, s, e, BinnedTime.Week))
        .select("fid").as[Int].collect().toSet
      assert(expr1 == fn, s"bbox $bbox: expr=$expr1 fn=$fn")
    }
  }

  test("z2 planner: bbox cover is sound and selective") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = features.toDF("fid", "track", "millis", "lon", "lat")
      .withColumn("z2", expr("st_z2(st_makePoint(lon, lat))"))
    val inBox = df.where(ZQuery.z2Filter(col("z2"), (38, 59, 51, 61)))
      .select("fid").as[Int].collect().toSet
    assert((0 until 20).toSet.subsetOf(inBox)) // all lon 40-49 rows covered
    val far = df.where(ZQuery.z2Filter(col("z2"), (-170, -80, -160, -70))).count()
    assert(far == 0)
  }

  test("cellFilter partition pruning predicates match cell assignment") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = features.toDF("fid", "track", "millis", "lon", "lat")
      .withColumn("cell", expr("st_cellOfXY(lon, lat, 8)"))
    val pruned = df.where(ZQuery.cellFilter(col("cell"), (38, 59, 51, 61), 8))
      .select("fid").as[Int].collect().toSet
    assert((0 until 20).toSet.subsetOf(pruned))
    assert(df.where(ZQuery.cellFilter(col("cell"), (-10, -10, 10, 10), 8)).count() == 0)
  }
}
