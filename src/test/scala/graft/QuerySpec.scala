package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * The GraftQuery facade vs the reference's Query+hints semantics
 * (geomesa-index-api conf/QueryHints.scala; QueryPlanner hint routing).
 */
class QuerySpec extends AnyFunSuite with Matchers with SparkTest {

  import spark.implicits._

  private lazy val df = (0 until 300).map { i =>
    (i.toLong, s"u${i % 7}", i % 3 match { case 0 => "click"; case 1 => "view"; case _ => "buy" },
      (i % 100).toDouble, (i * 7 % 360) - 180.0, (i * 13 % 160) - 80.0)
  }.toDF("id", "user", "kind", "value", "lon", "lat")

  test("filter + transforms (name and name=expression) + sort + limit compose") {
    val out = QueryRunner.run(df, GraftQuery(
      cql = "kind = 'click' AND value >= 10",
      transforms = Seq("id", "shout=strToUpperCase(kind)", "v2=value * 2"),
      sortBy = Seq(("id", true)),
      maxFeatures = Some(5)))
    out.columns.toSeq shouldBe Seq("id", "shout", "v2")
    val rows = out.collect()
    rows.length shouldBe 5
    rows.map(_.getLong(0)).toSeq shouldBe rows.map(_.getLong(0)).sorted(Ordering[Long].reverse).toSeq
    rows.foreach { r => r.getString(1) shouldBe "CLICK"; r.getDouble(2) % 2 shouldBe 0.0 }
  }

  test("sampling keeps ~fraction deterministically; sampleBy guarantees one per key") {
    val s = QueryRunner.run(df, GraftQuery(sampling = Some(0.1)))
    s.count() shouldBe 30 // every-10th of 300, deterministic
    // re-run identical
    QueryRunner.run(df, GraftQuery(sampling = Some(0.1)))
      .select("id").as[Long].collect().toSet shouldBe
      s.select("id").as[Long].collect().toSet

    val byKey = QueryRunner.run(df, GraftQuery(sampling = Some(0.02), sampleBy = Some("user")))
    val keys = byKey.select("user").distinct().as[String].collect().toSet
    keys shouldBe (0 until 7).map(i => s"u$i").toSet // at least one per key

    // fractions that round to n = 1 keep EVERY row (regression: rn % 1 == 1
    // never held, so 1.0 / 0.8 silently dropped the whole table)
    QueryRunner.run(df, GraftQuery(sampling = Some(1.0))).count() shouldBe 300
    QueryRunner.run(df, GraftQuery(sampling = Some(0.8), sampleBy = Some("user"))).count() shouldBe 300
  }

  test("statsString hint is terminal: one aggregated row like StatsScan") {
    val out = QueryRunner.run(df, GraftQuery(
      cql = "kind IN ('click', 'view')",
      statsString = Some("Count();MinMax(value)")))
    out.count() shouldBe 1
    val r = out.collect()(0)
    val expected = df.where(col("kind").isin("click", "view"))
    r.getAs[Long]("count") shouldBe expected.count()
  }

  test("density hint renders EXACTLY width x height raster pixels; " +
      "total count is preserved") {
    val out = QueryRunner.run(df, GraftQuery(
      density = Some(DensityHint(bbox = (-180, -80, 180, 80), width = 32, height = 16))))
    val inBox = df.where(col("lon").between(-180, 180) && col("lat").between(-80, 80))
    out.agg(sum("n")).as[Long].head() shouldBe inBox.count()
    out.columns should contain allOf ("i", "j", "n", "weight", "x", "y")
    // the reference renders exactly the hinted grid: indices within it,
    // centers snapped to the GridSnap kernel
    val snap = cells.GridSnap(-180, -80, 180, 80, 32, 16)
    out.collect().foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      assert(i >= 0 && i < 32 && j >= 0 && j < 16)
      assert(r.getAs[Double]("x") == snap.x(i) && r.getAs[Double]("y") == snap.y(j))
    }
    // weight expression is a CQL expression
    val weighted = QueryRunner.run(df, GraftQuery(
      density = Some(DensityHint(bbox = (-180, -80, 180, 80), width = 8, height = 4,
        weight = Some("value * 2")))))
    weighted.agg(sum("weight")).as[Double].head() shouldBe
      inBox.agg(sum(col("value") * 2)).as[Double].head()
  }

  test("BIN hint projects the wire-compact record") {
    val withTs = df.withColumn("dtg", timestamp_micros(col("id") * 1000000L))
    val out = QueryRunner.run(withTs, GraftQuery(
      cql = "kind = 'buy'", binTrack = Some(BinHint("user", "dtg"))))
    out.columns.toSeq shouldBe Seq("track_hash", "dtg_s", "lat", "lon")
    out.count() shouldBe withTs.where(col("kind") === "buy").count()
    out.select("dtg_s").as[Int].collect().foreach(s => s should be < 300)
  }

  test("stats / density / BIN are mutually exclusive, like the reference planner") {
    an[IllegalArgumentException] should be thrownBy QueryRunner.run(df,
      GraftQuery(statsString = Some("Count()"),
        density = Some(DensityHint(bbox = (0, 0, 1, 1)))))
  }

  test("indexed-table entry resolves geom and keeps pushdown-compatible shape") {
    val root = java.nio.file.Files.createTempDirectory("graft_query_tbl").toString
    table.SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4)
    val out = QueryRunner.run(spark, root, "s1",
      GraftQuery(cql = "BBOX(geom, -50, -20, 30, 25) AND value > 20",
        transforms = Seq("id")),
      lonCol = "lon", latCol = "lat", idColumn = "id")
    val expect = df.where(col("lon").between(-50, 30) && col("lat").between(-20, 25) &&
      col("value") > 20).select("id").as[Long].collect().toSet
    out.as[Long].collect().toSet shouldBe expect
    expect should not be empty
  }
}
