package graft.table

import java.nio.file.Files

import graft.SparkTest
import graft.cells.GeoHash
import graft.operators.Mosaic
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Ports of the reference's raster store suites over RasterTable:
 * AccumuloRasterQueryPlannerTest (the 11 resolution-selection cases),
 * RasterBoundsTableTest (bounds semantics), and the query cases of
 * AccumuloRasterStoreQueryIntegratedTest / QueryAndMosaicTest
 * (geomesa-accumulo-raster/src/test/.../data/) — same fixtures,
 * asserted through the Parquet snapshot + planner instead of a mock
 * Accumulo connector.
 */
class RasterTableSpec extends AnyFunSuite with SparkTest {

  private def newRoot(): String =
    Files.createTempDirectory("graft-raster").toString

  /** generateTestRaster: a solid chunk with explicit ingest resolution
    * (RasterTestsUtils.scala:62-70; res defaults to 10.0 there). */
  private def chunksDf(rows: Seq[(String, Double, Double, Double, Double, Double, Int)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("rid", "minx", "miny", "maxx", "maxy", "res", "color")
      .withColumn("w", lit(16)).withColumn("h", lit(16))
      .withColumn("pixels", transform(sequence(lit(1), lit(256)), _ => col("color")))
      .drop("color")
  }

  private def ghBox(hash: String): (Double, Double, Double, Double) = {
    val (lo, la, hi, ha) = GeoHash(hash).bbox
    (lo, la, hi, ha)
  }

  private def writeStore(rows: Seq[(String, Double, Double, Double, Double, Double, Int)]): String = {
    val root = newRoot()
    RasterTable.write(spark, chunksDf(rows), root, "s1", partitions = 2)
    root
  }

  private def query(root: String, minx: Double, miny: Double, maxx: Double, maxy: Double,
                    res: Double = 10.0): DataFrame =
    RasterTable.query(spark, root, "s1", minx, miny, maxx, maxy, res)

  // --- lexi resolution keys -------------------------------------------

  test("lexi res keys round-trip truncated and sort like the doubles") {
    val vals = Seq(45.0 / 256.0, 45.0 / 1024.0, 1.0, 10.0, 0.0001, 123456.789)
    for (v <- vals) {
      assert(RasterTable.lexiDecodeRes(RasterTable.lexiEncodeRes(v)) === RasterTable.truncateRes(v))
    }
    val sortedByKey = vals.sortBy(RasterTable.lexiEncodeRes)
    assert(sortedByKey === vals.sorted)
  }

  // --- AccumuloRasterQueryPlannerTest ---------------------------------

  test("resolution selection rounds down across the 11 planner cases") {
    // two stored resolutions over (0,45)^2; query 45/size
    val r1 = 45.0 / 256.0
    val r2 = 45.0 / 1024.0
    val root = writeStore(Seq(
      ("c1", 0.0, 0.0, 45.0, 45.0, r1, 1),
      ("c2", 0.0, 0.0, 45.0, 45.0, r2, 2)))
    val cases = Seq(
      128 -> r1, 156 -> r1, 201 -> r1, 256 -> r1,
      257 -> r2, 432 -> r2, 512 -> r2, 1000 -> r2, 1024 -> r2, 1025 -> r2, 2000 -> r2)
    for ((size, expected) <- cases) {
      val got = query(root, 0, 0, 45, 45, res = 45.0 / size)
        .select("res").distinct().collect().map(_.getDouble(0)).toSeq
      assert(got === Seq(expected), s"query pixel size $size")
    }
  }

  // --- RasterBoundsTableTest ------------------------------------------

  test("bounds of an unknown layer are the whole world") {
    assert(RasterTable.bounds(spark, newRoot(), "s1") === ((-180.0, -90.0, 180.0, 90.0)))
  }

  test("bounds of a single raster, duplicates, and adjacent rasters") {
    val single = writeStore(Seq(("c1", 0.0, 0.0, 50.0, 50.0, 10.0, 1)))
    assert(RasterTable.bounds(spark, single, "s1") === ((0.0, 0.0, 50.0, 50.0)))

    val dup = writeStore(Seq(
      ("c1", 0.0, 0.0, 50.0, 50.0, 10.0, 1), ("c2", 0.0, 0.0, 50.0, 50.0, 10.0, 2)))
    assert(RasterTable.bounds(spark, dup, "s1") === ((0.0, 0.0, 50.0, 50.0)))

    val adj = writeStore(Seq(
      ("c1", -50.0, 0.0, 0.0, 50.0, 10.0, 1), ("c2", 0.0, 0.0, 50.0, 50.0, 10.0, 2)))
    assert(RasterTable.bounds(spark, adj, "s1") === ((-50.0, 0.0, 50.0, 50.0)))
  }

  // --- AccumuloRasterStoreQueryIntegratedTest -------------------------

  test("populate and query returns the stored raster") {
    val root = writeStore(Seq(("c1", 0.0, 0.0, 50.0, 50.0, 10.0, 1)))
    assert(query(root, 0, 0, 50, 50).count() === 1)
  }

  test("an empty store returns nothing") {
    assert(query(newRoot(), 0, 0, 50, 50).count() === 0)
  }

  test("filter in a geohash-conforming raster via a query bbox") {
    val (lo, la, hi, ha) = ghBox("s")
    val root = writeStore(Seq(("c1", lo, la, hi, ha, 10.0, 1)))
    assert(query(root, 0, 0, 50, 50).count() === 1)
  }

  test("filter out a disjoint raster via a query bbox") {
    val (lo, la, hi, ha) = ghBox("d")
    val root = writeStore(Seq(("c1", lo, la, hi, ha, 10.0, 1)))
    assert(query(root, 0, 0, 45, 45).count() === 0)
  }

  test("filter out one raster while keeping the matching one") {
    val (slo, sla, shi, sha) = ghBox("s")
    val (dlo, dla, dhi, dha) = ghBox("d")
    val root = writeStore(Seq(
      ("c1", slo, sla, shi, sha, 10.0, 1), ("c2", dlo, dla, dhi, dha, 10.0, 2)))
    val rows = query(root, 0, 0, 50, 50).collect()
    assert(rows.length === 1 && rows.head.getAs[String]("rid") === "c1")
  }

  test("filter in a raster conforming to a geohash via bbox and resolution") {
    val (lo, la, hi, ha) = ghBox("s")
    val root = writeStore(Seq(("c1", lo, la, hi, ha, 5.0, 1)))
    assert(query(root, 0, 0, 50, 50, res = 5.0).count() === 1)
  }

  test("a raster slightly smaller than a geohash is found") {
    val (lo, la, hi, ha) = ghBox("dqcjr")
    val root = writeStore(Seq(("c1", lo + 1e-4, la + 1e-4, hi - 1e-4, ha - 1e-4, 10.0, 1)))
    assert(query(root, lo - 1e-4, la - 1e-4, hi + 1e-4, ha + 1e-4).count() === 1)
  }

  test("a raster slightly larger than a geohash is found") {
    val (lo, la, hi, ha) = ghBox("dqcjr")
    val root = writeStore(Seq(("c1", lo - 1e-4, la - 1e-4, hi + 1e-4, ha + 1e-4, 10.0, 1)))
    assert(query(root, lo - 1e-4, la - 1e-4, hi + 1e-4, ha + 1e-4).count() === 1)
  }

  test("four geohash-conforming rasters near (0,0) all return") {
    val boxes = Seq("7", "k", "s", "e").map(ghBox)
    val rows = boxes.zipWithIndex.map { case ((lo, la, hi, ha), i) =>
      (s"c$i", lo, la, hi, ha, 10.0, i + 1)
    }
    val root = writeStore(rows)
    val q1 = boxes.head
    val q3 = boxes(2)
    assert(query(root, q1._1, q1._2, q3._3, q3._4).count() === 4)
  }

  test("the query prunes to the selected resolution partition and geohash ranges") {
    val r1 = 45.0 / 256.0
    val r2 = 45.0 / 1024.0
    val root = writeStore(Seq(
      ("c1", 0.0, 0.0, 45.0, 45.0, r1, 1),
      ("c2", 0.0, 0.0, 45.0, 45.0, r2, 2)))
    val plan = query(root, 0, 0, 45, 45, res = r1).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("res_key"),
      s"expected res_key partition pruning in:\n$plan")
    assert(plan.contains("StartsWith(gh") || plan.contains("PushedFilters: [IsNotNull(gh"),
      s"expected gh pushdown in:\n$plan")
  }

  test("a whole-world chunk (empty geohash key) is found next to small chunks") {
    // (0,0,60,60) has calculatePrecision <= 5 -> no acceptable hash -> gh ""
    // while (10,10,12,12) stores a real hash; both must come back
    val root = writeStore(Seq(
      ("big", 0.0, 0.0, 60.0, 60.0, 10.0, 1),
      ("small", 10.0, 10.0, 12.0, 12.0, 10.0, 2)))
    val rids = query(root, 5, 5, 40, 40).collect().map(_.getAs[String]("rid")).toSet
    assert(rids === Set("big", "small"))
  }

  test("a chunk whose centroid-keyed cell is outside the query region is still found") {
    // (-4,-6,4,2) strictly overlaps (2,1,34,27) but its centroid (0,-2)
    // hashes into a southern cell the old center+ring plan never scanned
    val root = writeStore(Seq(
      ("straddler", -4.0, -6.0, 4.0, 2.0, 10.0, 1),
      ("inside", 10.0, 10.0, 20.0, 20.0, 10.0, 2)))
    val rids = query(root, 2, 1, 34, 27).collect().map(_.getAs[String]("rid")).toSet
    assert(rids === Set("straddler", "inside"))
  }

  // --- QueryAndMosaicTest through the store ---------------------------

  test("the stored tile comes back pixel-exact through query + mosaic") {
    val s = spark
    import s.implicits._
    val b = (-77.1152343750, 43.001220703125, -77.104248046875, 43.0122070313125)
    val vsplit = Array.tabulate(16 * 16)(i => if (i % 16 < 8) 1 else 2)
    val root = newRoot()
    val df = Seq(("c0", b._1, b._2, b._3, b._4, 10.0)).toDF("rid", "minx", "miny", "maxx", "maxy", "res")
      .withColumn("w", lit(16)).withColumn("h", lit(16))
      .withColumn("pixels", typedLit(vsplit.toSeq))
    RasterTable.write(spark, df, root, "s1", partitions = 2)
    val got = query(root, b._1, b._2, b._3, b._4).collect()
    assert(got.length === 1)
    val r = got.head
    val c = Mosaic.Chunk(r.getAs[Double]("minx"), r.getAs[Double]("miny"),
      r.getAs[Double]("maxx"), r.getAs[Double]("maxy"),
      Mosaic.Grid(16, 16, r.getAs[Seq[Int]]("pixels").toArray))
    val (m, n) = Mosaic.mosaicChunks(Iterator(c), 16, 16, b._1, b._2, b._3, b._4)
    assert(n === 1)
    assert(m.get.pixels.sameElements(vsplit))
  }

  test("horizontal permutations: neighbors sharing only an edge never pollute the mosaic") {
    // QueryAndMosaicTest's west/center/east permutation cases: the strict
    // 2-D overlap refine (intersects AND NOT touches) drops edge-sharers
    val b = (-77.1152343750, 43.001220703125, -77.104248046875, 43.0122070313125)
    val dx = b._3 - b._1
    val root = writeStore(Seq(
      ("west", b._1 - dx, b._2, b._1, b._4, 10.0, 42),
      ("center", b._1, b._2, b._3, b._4, 10.0, 1),
      ("east", b._3, b._2, b._3 + dx, b._4, 10.0, 42)))
    val rows = query(root, b._1 + 1e-10, b._2 + 1e-10, b._3 - 1e-10, b._4 - 1e-10).collect()
    assert(rows.map(_.getAs[String]("rid")).toSeq === Seq("center"))
  }

  // --- distributed tile mosaic ----------------------------------------

  test("mosaicPerTile renders each tile from exactly its overlapping chunks") {
    val s = spark
    import s.implicits._
    val chunks = Seq(
      ("a", -50.0, 0.0, 0.0, 50.0, 1), ("b", 0.0, 0.0, 50.0, 50.0, 2),
      ("c", -50.0, -50.0, 0.0, 0.0, 3), ("d", 0.0, -50.0, 50.0, 0.0, 4),
      // spans two tiles horizontally
      ("e", -25.0, 60.0, 25.0, 90.0, 5))
      .toDF("rid", "minx", "miny", "maxx", "maxy", "color")
      .withColumn("w", lit(16)).withColumn("h", lit(16))
      .withColumn("pixels", transform(sequence(lit(1), lit(256)), _ => col("color")))
    val tiles = Mosaic.mosaicPerTile(chunks, tileDeg = 50.0, tileW = 8, tileH = 8)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getAs[Seq[Int]]("pixels"))))
      .toMap
    assert(tiles.keySet === Set((-1, 0), (0, 0), (-1, -1), (0, -1), (-1, 1), (0, 1)))
    assert(tiles((-1, 0))._2.toSet === Set(1))
    assert(tiles((0, 0))._2.toSet === Set(2))
    assert(tiles((-1, -1))._2.toSet === Set(3))
    assert(tiles((0, -1))._2.toSet === Set(4))
    // the spanning chunk fills only the covered half of its tiles
    assert(tiles((-1, 1))._2.toSet === Set(0, 5))
    assert(tiles((0, 1))._2.toSet === Set(0, 5))
  }
}
