package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.functions.StFunctions
import graft.cells.Cells

/** The codegen box operators must agree exactly with the generic
  * WKB/JTS operators and the cell kernel. */
class BoxOpsSpec extends AnyFunSuite with SparkTest {

  private lazy val ready: Unit = StFunctions.register(spark)

  private def boxes(n: Int, seed: Int, p: String) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val cx = rnd.nextDouble() * 60 - 30
      val cy = rnd.nextDouble() * 60 - 30
      val w = 0.2 + rnd.nextDouble() * 3
      (s"$p$i", cx - w, cy - w, cx + w, cy + w)
    }.toDF(s"${p}_id", s"${p}xmin", s"${p}ymin", s"${p}xmax", s"${p}ymax")
  }

  test("mortonColumn/cellColumn match Cells.pack bit-for-bit") {
    ready
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val res = 9
    val n = 1L << res
    val coords = (0 until 500).map(_ => (rnd.nextLong().abs % n, rnd.nextLong().abs % n))
    val df = coords.toDF("tx", "ty")
      .withColumn("cell", BoxOps.cellColumn(col("tx"), col("ty"), res))
      .collect()
    df.foreach { r =>
      assert(r.getLong(2) == Cells.pack(res, r.getLong(0), r.getLong(1)))
    }
  }

  test("box intersects-join equals the WKB/JTS spatial join") {
    ready
    val a = boxes(80, 1, "a").withColumn("a_geom", expr("st_makeBBOX(axmin, aymin, axmax, aymax)"))
    val b = boxes(80, 2, "b").withColumn("b_geom", expr("st_makeBBOX(bxmin, bymin, bxmax, bymax)"))
    val fast = BoxOps.intersectsJoin(a, ("axmin", "aymin", "axmax", "aymax"),
        b, ("bxmin", "bymin", "bxmax", "bymax"), res = 6)
      .select("a_id", "b_id").collect().map(r => (r.getString(0), r.getString(1)))
    val wkb = SpatialJoin.intersects(a, "a_geom", b, "b_geom", res = 6)
      .select("a_id", "b_id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(fast.length == fast.distinct.length)
    assert(fast.toSet == wkb.toSet && wkb.nonEmpty)
  }

  test("box tiles equal TileAssign.atRes cells") {
    ready
    val a = boxes(40, 5, "a").withColumn("a_geom", expr("st_makeBBOX(axmin, aymin, axmax, aymax)"))
    val fast = BoxOps.tiles(a, "axmin", "aymin", "axmax", "aymax", 9)
      .select("a_id", "tile").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val generic = TileAssign.atRes(a, "a_geom", 9, maxCells = 4096)
      .select("a_id", "tile").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fast == generic && generic.nonEmpty)
  }

  test("box join size split: world-spanning boxes match brute force under a tiny budget") {
    ready
    import spark.implicits._
    val smalls = boxes(60, 9, "a")
    val b = (Seq(
      ("b_world", -179.0, -89.0, 179.0, 89.0),
      ("b_band", -179.0, -10.0, 179.0, 10.0)) ++
      (0 until 40).map { i =>
        val rnd = new scala.util.Random(100 + i)
        val cx = rnd.nextDouble() * 60 - 30; val cy = rnd.nextDouble() * 60 - 30
        (s"b$i", cx - 1, cy - 1, cx + 1, cy + 1)
      }).toDF("b_id", "bxmin", "bymin", "bxmax", "bymax")
    // maxCells=16 forces even moderate boxes through the huge branch
    val fast = BoxOps.intersectsJoin(smalls, ("axmin", "aymin", "axmax", "aymax"),
        b, ("bxmin", "bymin", "bxmax", "bymax"), res = 6, maxCells = 16)
      .select("a_id", "b_id").collect().map(r => (r.getString(0), r.getString(1)))
    val brute = smalls.crossJoin(b)
      .where(col("axmin") <= col("bxmax") && col("axmax") >= col("bxmin") &&
        col("aymin") <= col("bymax") && col("aymax") >= col("bymin"))
      .select("a_id", "b_id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(fast.length == fast.distinct.length, "duplicate pairs")
    assert(fast.toSet == brute.toSet,
      s"missing=${(brute.toSet -- fast.toSet).take(5)} extra=${(fast.toSet -- brute.toSet).take(5)}")
    assert(brute.count(_._2 == "b_world") == 60, "world box must match every left box")
  }

  test("box join plan is pure codegen (no ScalaUDF / BatchEvalPython)") {
    ready
    val a = boxes(10, 7, "a")
    val b = boxes(10, 8, "b")
    val plan = BoxOps.intersectsJoin(a, ("axmin", "aymin", "axmax", "aymax"),
        b, ("bxmin", "bymin", "bxmax", "bymax"), res = 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.toLowerCase.contains("scalaudf"), s"udf in plan:\n$plan")
  }
}
