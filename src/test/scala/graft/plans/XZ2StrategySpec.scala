package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.functions.StFunctions

/**
 * Port of the reference's XZ2 index strategy fixture and its exact
 * feature-id assertions (/root/reference/geomesa-accumulo/
 * geomesa-accumulo-datastore/src/test/scala/.../index/
 * XZ2IdxStrategyTest.scala:30-125): 10 points (track1, POINT(40 6i))
 * and 10 polygons (track2, 2x10-degree boxes marching up lat 20-39)
 * through the XZ2 extent index: xz ranges (coarse, must be a cover)
 * then the exact st_intersects refine must give the reference's id
 * sets.
 */
class XZ2StrategySpec extends AnyFunSuite with SparkTest {

  private val Res = 12

  private lazy val table = {
    StFunctions.register(spark)
    import spark.implicits._
    val wkts = (0 until 10).map { i =>
      (i, s"name$i", s"POINT(40 6$i)")
    } ++ (10 until 20).map { i =>
      val d = i - 10
      (i, s"name$i", s"POLYGON((40 3$d, 42 3$d, 42 2$d, 40 2$d, 40 3$d))")
    }
    wkts.toDF("fid", "name", "wkt")
      .withColumn("geom", expr("st_geomFromWKT(wkt)"))
      .withColumn("xz", expr(s"st_xz2(geom, $Res)"))
      .cache()
  }

  /** (coarse ids from the xz range cover, exact ids after refine). */
  private def query(bbox: (Double, Double, Double, Double), extra: String = "true"):
      (Set[Int], Set[Int]) = {
    import spark.implicits._
    val ranges = graft.cells.XZ2(Res).ranges(bbox._1, bbox._2, bbox._3, bbox._4, maxRanges = 64)
    val coarseCol = ranges.map(r => col("xz").between(lit(r.lower), lit(r.upper))).reduce(_ || _)
    val coarse = table.where(coarseCol).where(expr(extra))
    val exact = coarse.where(expr(
      s"st_intersects(geom, st_makeBBOX(${bbox._1}, ${bbox._2}, ${bbox._3}, ${bbox._4}))"))
    (coarse.select("fid").as[Int].collect().toSet,
      exact.select("fid").as[Int].collect().toSet)
  }

  test("whole world returns everything (XZ2IdxStrategyTest:59-64)") {
    val (coarse, exact) = query((-180, -90, 180, 90))
    assert(exact == (0 to 19).toSet)
    assert(coarse == (0 to 19).toSet)
  }

  test("inclusive filter - points (XZ2IdxStrategyTest:66-71)") {
    val (coarse, exact) = query((35, 55, 45, 75))
    assert(exact == (0 to 9).toSet)
    assert(exact.subsetOf(coarse), "xz cover must be a superset")
  }

  test("inclusive filter - polygons (XZ2IdxStrategyTest:73-78)") {
    val (_, exact) = query((35, 29, 45, 31))
    assert(exact == (10 to 19).toSet)
  }

  test("exclusive filter - points (XZ2IdxStrategyTest:80-85)") {
    val (_, exact) = query((35, 55, 45, 65))
    assert(exact == (0 to 5).toSet)
  }

  test("exclusive filter - polygons (XZ2IdxStrategyTest:87-92)") {
    val (_, exact) = query((35, 38, 45, 40))
    assert(exact == (18 to 19).toSet)
  }

  test("small bboxes - points (XZ2IdxStrategyTest:94-99)") {
    val (_, exact) = query((39.999, 60.999, 40.001, 61.001))
    assert(exact == Set(1))
  }

  test("small bboxes - polygons (XZ2IdxStrategyTest:101-106)") {
    val (_, exact) = query((39.999, 21.999, 40.001, 22.001))
    assert(exact == (10 to 12).toSet)
  }

  test("secondary filters - points and polygons (XZ2IdxStrategyTest:108-120)") {
    val (_, exactPts) = query((35, 55, 45, 75), "name = 'name8'")
    assert(exactPts == Set(8))
    val (_, exactPolys) = query((35, 22, 45, 24), "name = 'name11'")
    assert(exactPolys == Set(11))
  }
}
