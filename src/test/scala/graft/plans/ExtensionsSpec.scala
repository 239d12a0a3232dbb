package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.StFunctions

/** The injected Catalyst rules: spatial join rewrite kills the cartesian
  * product, literal folding evaluates constant st_* calls at plan time
  * (analog of the plan assertions in the reference's SparkSQLDataTest:
  * 162-186, 303-307). */
class ExtensionsSpec extends AnyFunSuite {

  // dedicated session: extensions must be installed at build time.
  // Clear the active/default session first so getOrCreate builds a NEW
  // SparkSession (sharing the context) instead of returning the shared
  // test session that lacks the extensions.
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    StFunctions.register(s)
    s
  }

  private def mkTables(): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val pts = (0 until 200).map(i => (s"p$i", rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 40 - 20))
      .toDF("p_id", "lon", "lat")
      .selectExpr("p_id", "st_makePoint(lon, lat) AS p_geom")
    val polys = (0 until 15).map { i =>
      val cx = rnd.nextDouble() * 40 - 20; val cy = rnd.nextDouble() * 40 - 20
      (s"z$i", cx - 2, cy - 2, cx + 2, cy + 2)
    }.toDF("z_id", "x0", "y0", "x1", "y1")
      .selectExpr("z_id", "st_makeBBOX(x0, y0, x1, y1) AS z_geom")
    pts.createOrReplaceTempView("pts")
    polys.createOrReplaceTempView("polys")
  }

  test("SQL spatial join is rewritten to a cell equi-join (no CartesianProduct; " +
    "bulk goes through the grid hash join)") {
    mkTables()
    val q = spark.sql(
      "SELECT p_id, z_id FROM pts JOIN polys ON st_intersects(p_geom, z_geom)")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), s"cartesian product in plan:\n$phys")
    // the small x small bulk is a hash join on the generated cell key;
    // the only BNLJ branches are against filtered-huge sides (empty here,
    // collapsed by AQE at runtime)
    assert(phys.contains("__graft_lcell"), s"grid branch missing:\n$phys")
    // and it computes the right answer
    val fast = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = spark.sql(
      "SELECT /*+ BROADCAST(polys) */ p_id, z_id FROM pts, polys WHERE st_distance(p_geom, z_geom) = 0")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == brute && brute.nonEmpty)
  }

  test("SQL spatial join with continent-sized zones (size split): no pair loss " +
    "where the old cover would coarsen") {
    mkTables()
    import spark.implicits._
    // JoinRes=7 cells are ~2.8 deg; MaxCoverCells=64 -> any zone wider
    // than ~8 cells (~23 deg) used to coarsen its cover and silently lose
    // every pair. These zones are up to 160 deg wide.
    val rnd = new scala.util.Random(11)
    val zones = ((0 until 3).map { i =>
      (s"big$i", -80.0 + i * 10, -40.0 + i * 5, 80.0 - i * 10, 40.0 - i * 5)
    } ++ (0 until 10).map { i =>
      val cx = rnd.nextDouble() * 80 - 40; val cy = rnd.nextDouble() * 80 - 40
      (s"sm$i", cx - 2, cy - 2, cx + 2, cy + 2)
    }).toDF("z_id", "x0", "y0", "x1", "y1")
      .selectExpr("z_id", "st_makeBBOX(x0, y0, x1, y1) AS z_geom")
    zones.createOrReplaceTempView("bigzones")
    val q = spark.sql(
      "SELECT p_id, z_id FROM pts JOIN bigzones ON st_intersects(p_geom, z_geom)")
    val fast = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = spark.sql(
      "SELECT /*+ BROADCAST(bigzones) */ p_id, z_id FROM pts, bigzones WHERE st_distance(p_geom, z_geom) = 0")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == brute, s"missing=${(brute -- fast).take(5)} extra=${(fast -- brute).take(5)}")
    assert(brute.exists(_._2.startsWith("big")), "big zones must actually match points")
    assert(fast.size == q.collect().length, "duplicate pairs emitted")
  }

  test("SpatialFilterRule: WHERE st_intersects(st_makePoint(lon,lat), literal) " +
    "pushes envelope bounds into the Parquet scan and prunes cell_prefix partitions") {
    mkTables()
    import spark.implicits._
    val root = "/tmp/graft_ext_rule_tbl"
    val rnd = new scala.util.Random(31)
    val df = (0 until 2000).map { i =>
      (i.toLong, rnd.nextDouble() * 340 - 170, rnd.nextDouble() * 160 - 80)
    }.toDF("id", "lon", "lat")
    // fresh table per run (deterministic content, tiny)
    val dir = new java.io.File(root)
    if (dir.exists()) { def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }; rm(dir) }
    graft.table.SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4)
    spark.conf.set("spark.graft.index.res", "9")
    try {
      graft.table.SpatialTable.read(spark, root, "s1").createOrReplaceTempView("rule_tbl")
      val q = spark.sql(
        """SELECT id FROM rule_tbl WHERE st_intersects(st_makePoint(lon, lat),
          |  st_geomFromWKT('POLYGON((0 0, 40 0, 40 30, 0 30, 0 0))'))""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      // envelope bounds reached the scan
      // (the PushedFilters display truncates; the lon bounds appearing
      // there plus the lat bound in the Filter proves all four reached
      // the optimizer and the scan)
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(lon,0.0)") &&
        "lat#\\d+ <= 30\\.0".r.findFirstIn(plan).isDefined,
        s"envelope bounds not pushed:\n$plan")
      // cell z-ranges on the sorted column reached the plan too
      assert("cell#\\d+L >= ".r.findFirstIn(plan).isDefined, s"cell ranges not derived:\n$plan")
      // partition-directory pruning on cell_prefix: the bbox only touches
      // prefix cells intersecting [0,40]x[0,30] — far fewer than all 64
      val scannedPrefixes = q.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(scannedPrefixes > 0 && scannedPrefixes <= 8,
        s"expected <=8 pruned partitions, scanned $scannedPrefixes:\n$plan")
      // and the answer equals the plain predicate
      val expect = df.where(col("lon").between(0, 40) && col("lat").between(0, 30))
        .select("id").as[Long].collect().sorted.toSeq
      val got = q.as[Long].collect().sorted.toSeq
      assert(got == expect && expect.nonEmpty)
    } finally spark.conf.unset("spark.graft.index.res")
  }

  test("SpatialTable.queryCql: an ECQL BBOX string gets the SAME pushdown as a " +
    "hand-written st_intersects filter (QueryProcess-through-planner analog)") {
    import spark.implicits._
    val root = "/tmp/graft_ext_rule_tbl" // written by the previous test's table
    val rnd = new scala.util.Random(31)
    val df = (0 until 2000).map { i =>
      (i.toLong, rnd.nextDouble() * 340 - 170, rnd.nextDouble() * 160 - 80)
    }.toDF("id", "lon", "lat")
    graft.table.SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4) // no-op if committed
    spark.conf.set("spark.graft.index.res", "9")
    try {
      val q = graft.table.SpatialTable.queryCql(spark, root, "s1",
        "BBOX(geom, 0, 0, 40, 30) AND id >= 10").select("id")
      val plan = q.queryExecution.executedPlan.toString
      // the PushedFilters display truncates after the id predicates, so
      // assert the lon prefix there and the full bounds in the Filter
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThanOrEqual(lon") &&
        "lon#\\d+ >= 0\\.0".r.findFirstIn(plan).isDefined &&
        "lat#\\d+ <= 30\\.0".r.findFirstIn(plan).isDefined,
        s"CQL envelope bounds not pushed:\n$plan")
      assert("cell#\\d+L >= ".r.findFirstIn(plan).isDefined, s"cell ranges not derived:\n$plan")
      val scannedPrefixes = q.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(scannedPrefixes > 0 && scannedPrefixes <= 8,
        s"expected <=8 pruned partitions, scanned $scannedPrefixes:\n$plan")
      val expect = df.where(col("lon").between(0, 40) && col("lat").between(0, 30) && col("id") >= 10)
        .select("id").as[Long].collect().sorted.toSeq
      assert(q.as[Long].collect().sorted.toSeq == expect && expect.nonEmpty)
    } finally spark.conf.unset("spark.graft.index.res")
  }

  test("SpatialFilterRule: st_dwithin filter derives expanded bounds; OR'd geometries " +
    "compose as OR'd bounds; a non-derivable OR branch disables pruning") {
    mkTables()
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    // parquet-backed (a LocalRelation would be whole-filter folded at
    // plan time and leave nothing to assert on)
    val dir = java.nio.file.Files.createTempDirectory("graft_fr_pts").toString
    (0 until 1500).map { i =>
      (i.toLong, rnd.nextDouble() * 340 - 170, rnd.nextDouble() * 160 - 80)
    }.toDF("id", "lon", "lat").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    df.createOrReplaceTempView("fr_pts")
    // dwithin: bounds expanded by the conservative metric->degree radius
    val q1 = spark.sql(
      """SELECT id FROM fr_pts WHERE st_dwithin(st_makePoint(lon, lat),
        |  st_geomFromWKT('POINT(10 20)'), 300000.0)""".stripMargin)
    val p1 = q1.queryExecution.optimizedPlan.toString
    assert("lon#\\d+ >= ".r.findFirstIn(p1).isDefined, s"dwithin bounds not derived:\n$p1")
    val expect1 = df.where(
      expr("st_dwithin(st_makePoint(lon, lat), st_geomFromWKT('POINT(10 20)'), 300000.0)"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(q1.as[Long].collect().sorted.toSeq == expect1 && expect1.nonEmpty)

    // OR of two literals: both branches derive -> OR'd bounds conjunct
    val q2 = spark.sql(
      """SELECT id FROM fr_pts
        |WHERE st_intersects(st_makePoint(lon, lat), st_makeBBOX(0, 0, 20, 20))
        |   OR st_intersects(st_makePoint(lon, lat), st_makeBBOX(-60, -30, -40, -10))""".stripMargin)
    val p2 = q2.queryExecution.optimizedPlan.toString
    assert("lon#\\d+ >= ".r.findFirstIn(p2).isDefined, s"OR bounds not derived:\n$p2")
    val expect2 = df.where(col("lon").between(0, 20) && col("lat").between(0, 20) ||
      (col("lon").between(-60, -40) && col("lat").between(-30, -10)))
      .select("id").as[Long].collect().sorted.toSeq
    assert(q2.as[Long].collect().sorted.toSeq == expect2 && expect2.nonEmpty)

    // OR with a non-spatial branch: pruning must NOT fire (rows matching
    // only the other branch would be lost)
    val q3 = spark.sql(
      """SELECT id FROM fr_pts
        |WHERE st_intersects(st_makePoint(lon, lat), st_makeBBOX(0, 0, 10, 10)) OR id < 5""".stripMargin)
    assert(q3.count() == df.where(col("lon").between(0, 10) && col("lat").between(0, 10) ||
      col("id") < 5).count())
  }

  test("SQL st_dwithinPlanar join is rewritten to a cell equi-join and matches brute force") {
    mkTables()
    val q = spark.sql(
      "SELECT p_id, z_id FROM pts JOIN polys ON st_dwithinPlanar(p_geom, z_geom, 3.0)")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), s"cartesian in plan:\n$phys")
    assert(phys.contains("__graft_lcell"), s"grid branch missing:\n$phys")
    val fast = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = spark.sql(
      "SELECT /*+ BROADCAST(polys) */ p_id, z_id FROM pts, polys WHERE st_distance(p_geom, z_geom) < 3.0")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == brute && brute.nonEmpty)
  }

  test("SQL st_dwithin (meters) join is rewritten and matches brute force") {
    mkTables()
    val q = spark.sql(
      "SELECT p_id, z_id FROM pts JOIN polys ON st_dwithin(p_geom, z_geom, 250000.0)")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), s"cartesian in plan:\n$phys")
    val fast = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = spark.sql(
      """SELECT /*+ BROADCAST(polys) */ p_id, z_id FROM pts, polys
        |WHERE st_dwithin(p_geom, z_geom, 250000.0)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == brute && brute.nonEmpty)
  }

  test("rewrite preserves extra join conjuncts") {
    mkTables()
    val q = spark.sql(
      "SELECT p_id, z_id FROM pts JOIN polys ON st_intersects(p_geom, z_geom) AND p_id != 'p0'")
    assert(!q.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    assert(q.collect().forall(_.getString(0) != "p0"))
  }

  test("non-spatial joins are untouched") {
    mkTables()
    val q = spark.sql("SELECT a.p_id FROM pts a JOIN pts b ON a.p_id = b.p_id")
    assert(q.count() == 200)
  }

  test("st_cell_native (codegen Expression) matches the UDF bit-for-bit") {
    mkTables()
    import graft.cells.Cells
    val rows = spark.sql(
      """SELECT st_cell_native(lon, lat, 9) AS native, st_cellOfXY(lon, lat, 9) AS viaUdf, lon, lat
        |FROM (SELECT CAST(id AS DOUBLE) / 10 - 50 AS lon, CAST(id AS DOUBLE) / 20 - 25 AS lat
        |      FROM range(1000))""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) == Cells.cell(r.getDouble(2), r.getDouble(3), 9))
    }
    // null propagation through the native expression
    assert(spark.sql("SELECT st_cell_native(CAST(NULL AS DOUBLE), 0.0, 9)").head.isNullAt(0))
  }

  test("native geom expressions (st_intersects/env_cover/owner_cell) match UDF twins") {
    mkTables()
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val boxes = (0 until 200).map { i =>
      val cx = rnd.nextDouble() * 80 - 40; val cy = rnd.nextDouble() * 80 - 40
      val w = 0.5 + rnd.nextDouble() * 5
      (i, cx - w, cy - w, cx + w, cy + w, rnd.nextDouble() * 80 - 40, rnd.nextDouble() * 80 - 40)
    }.toDF("i", "x0", "y0", "x1", "y1", "qx", "qy")
    boxes.createOrReplaceTempView("nb")
    val rows = spark.sql(
      """SELECT
        |  st_intersects_native(st_makeBBOX(x0, y0, x1, y1), st_makePoint(qx, qy)) AS ni,
        |  st_intersects(st_makeBBOX(x0, y0, x1, y1), st_makePoint(qx, qy)) AS ui,
        |  st_env_cover_native(st_makeBBOX(x0, y0, x1, y1), 6, 256) AS nc,
        |  st_cellCover(st_makeBBOX(x0, y0, x1, y1), 6, 256) AS uc,
        |  st_owner_cell_native(st_makeBBOX(x0, y0, x1, y1), st_makePoint(qx, qy), 6) AS no
        |FROM nb""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(1), "intersects parity")
      // rectangles: refined cover == envelope cover
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "cover parity")
      assert(graft.cells.Cells.res(r.getLong(4)) == 6)
    }
    // and the SpatialJoin operator (now on native expressions) still
    // plans without ScalaUDF in the refine/cover slots
    val a = spark.sql("SELECT i AS a_id, st_makeBBOX(x0, y0, x1, y1) AS a_geom FROM nb")
    val b = spark.sql("SELECT i AS b_id, st_makePoint(qx, qy) AS b_geom FROM nb")
    val plan = graft.operators.SpatialJoin.intersects(a, "a_geom", b, "b_geom", res = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("intersectswkb") || plan.contains("IntersectsWkb") ||
      plan.toLowerCase.contains("st_intersects_native") || !plan.contains("graft_cover"),
      s"native refine missing from plan:\n${plan.take(2000)}")
  }

  test("join routing is UDF-free: fused CoverHugeWkb + native refine everywhere " +
    "(no ScalaUDF survives the st_intersects join rewrite)") {
    mkTables()
    val q = spark.sql(
      "SELECT p_id, z_id FROM pts JOIN polys ON st_intersects(p_geom, z_geom)")
    val optimized = q.queryExecution.optimizedPlan
    val udfs = optimized.collect { case p =>
      p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalaUDF => s.udfName.getOrElse("?")
      })
    }.flatten
    assert(udfs.isEmpty, s"ScalaUDFs left in the rewritten join plan: $udfs")
    val planStr = optimized.toString
    assert(planStr.contains("coverhugewkb") || planStr.contains("CoverHugeWkb") ||
      planStr.toLowerCase.contains("cover_huge") || planStr.contains("huge"),
      s"fused routing expression missing:\n${planStr.take(1500)}")
    // the DataFrame-API operator is equally UDF-free on the extent path
    val a = spark.sql("SELECT z_id AS a_id, z_geom AS a_geom FROM polys")
    val b = spark.sql("SELECT z_id AS b_id, z_geom AS b_geom FROM polys")
    val op = graft.operators.SpatialJoin.intersects(a, "a_geom", b, "b_geom", res = 6)
    val opUdfs = op.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalaUDF => s.udfName.getOrElse("?")
      })
    }.flatten
    assert(opUdfs.isEmpty, s"ScalaUDFs left in the operator plan: $opUdfs")
    // TileAssign's adaptive res is native too
    val t = graft.operators.TileAssign.adaptive(a, "a_geom", minRes = 2, maxRes = 8)
    val tUdfs = t.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
          s.udfName.getOrElse("?")
      })
    }.flatten
    assert(!tUdfs.exists(_.contains("adaptive")), s"adaptiveRes still a UDF: $tUdfs")
  }

  test("constant st_* expressions fold to literals at plan time") {
    mkTables()
    val q = spark.sql(
      "SELECT p_id FROM pts WHERE st_intersects(st_geomFromWKT('POLYGON((-20 -20, -20 20, 20 20, 20 -20, -20 -20))'), p_geom)")
    val optimized = q.queryExecution.optimizedPlan
    val leftoverConstructors = optimized.expressions.flatMap(_.collect {
      case s: org.apache.spark.sql.catalyst.expressions.ScalaUDF
          if s.udfName.exists(_.equalsIgnoreCase("st_geomFromWKT")) => s
    })
    assert(leftoverConstructors.isEmpty, "st_geomFromWKT not folded")
    assert(q.count() == 200) // whole box covers all points
  }
}
