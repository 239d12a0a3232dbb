package graft.cells

import org.scalatest.funsuite.AnyFunSuite

/**
 * Ports of the reference's ClosestAcceptableGeoHashTest
 * (geomesa-accumulo-raster/.../data/ClosestAcceptableGeoHashTest.scala)
 * and TouchingGeoHashesTest
 * (geomesa-process-vector/.../knn/TouchingGeoHashesTest.scala) — every
 * fixture value verbatim.
 */
class GeoHashOpsSpec extends AnyFunSuite {

  private def cagh(minLon: Double, maxLon: Double, minLat: Double, maxLat: Double): Option[String] =
    GeoHashOps.closestAcceptableGeoHash(minLon, maxLon, minLat, maxLat).map(_.hash)

  test("bounds that conform exactly to a geohash return that geohash") {
    val d = GeoHash("d")
    val (lo, la, hi, ha) = d.bbox
    assert(cagh(lo, hi, la, ha) === Some("d"))
  }

  test("bounds slightly smaller than a geohash return that geohash") {
    val d = GeoHash("d")
    val (lo, la, hi, ha) = d.bbox
    assert(cagh(lo + 0.5, hi - 0.5, la + 0.5, ha - 0.5) === Some("d"))
  }

  test("degenerate/outside-world bounds return None") {
    assert(cagh(0, 180, 90, 90) === None)
    assert(cagh(-180, 0, 90, 90) === None)
  }

  test("the reference's 15 QLevel fixtures") {
    // (minLon, maxLon, minLat, maxLat, expected) — ClosestAcceptableGeoHashTest:65-120
    val cases = Seq(
      (-90.0, -67.5, 22.5, 45.0, "d"),
      (-78.75, -67.5, 33.75, 45.0, "d"),
      (-78.75, -73.125, 33.75, 39.375, "dq"),
      (-78.75, -75.9375, 36.5625, 39.375, "dq"),
      (-78.75, -77.34375, 37.96875, 39.375, "dqb"),
      (-78.75, -78.046875, 38.671875, 39.375, "dqb"),
      (-78.75, -78.3984375, 39.0234375, 39.375, "dqb"),
      (-78.75, -78.57421875, 39.19921875, 39.375, "dqbp"),
      (-78.75, -78.662109375, 39.287109375, 39.375, "dqbp"),
      (-78.75, -78.7060546875, 39.3310546875, 39.375, "dqbpb"),
      (-78.75, -78.72802734375, 39.35302734375, 39.375, "dqbpb"),
      (-78.75, -78.739013671875, 39.364013671875, 39.375, "dqbpb"),
      (-78.75, -78.7445068359375, 39.3695068359375, 39.375, "dqbpbp"),
      (-78.75, -78.74725341796875, 39.37225341796875, 39.375, "dqbpbp"),
      (-78.75, -78.74862670898438, 39.373626708984375, 39.375, "dqbpbpb"))
    for ((lo, hi, la, ha, expected) <- cases) {
      assert(cagh(lo, hi, la, ha) === Some(expected), s"bbox ($lo,$hi,$la,$ha)")
    }
  }

  test("touching: Charlottesville interior cell has its 8 compass neighbors") {
    val gh = GeoHash(-78.4953560, 38.0752150, 30)
    val expected = Set("dqb0te", "dqb0tf", "dqb0td", "dqb0tu", "dqb0ts", "dqb0w5", "dqb0w4", "dqb0wh")
    val got = GeoHashOps.touching(gh).map(_.hash)
    assert(got.subsetOf(expected), s"unexpected neighbors: ${got -- expected}")
    assert(got === expected) // interior: all 8 exist
  }

  test("touching: Suva (antimeridian) mirrors across the dateline") {
    val gh = GeoHash(178.440, -18.140, 10)
    val expected = Set("rv", "rg", "re", "rs", "rt", "2j", "2h", "25")
    val got = GeoHashOps.touching(gh).map(_.hash)
    assert(got.subsetOf(expected), s"unexpected neighbors: ${got -- expected}")
  }

  test("touching: McMurdo (polar + antimeridian) expands to the polar ring") {
    val gh = GeoHash(166.68360, -77.842, 5)
    val expected = Set("h", "j", "n", "0", "1", "4", "5", "2", "r", "q")
    val got = GeoHashOps.touching(gh).map(_.hash)
    assert(got.subsetOf(expected), s"unexpected neighbors: ${got -- expected}")
  }

  test("coverFromBBox subdivides to intersecting children under the budget") {
    // quadrant 'd' bbox: subdividing from the common prefix keeps every
    // cover element a descendant-or-self prefix region intersecting it
    val d = GeoHash("d")
    val (lo, la, hi, ha) = d.bbox
    val cover = GeoHashOps.coverFromBBox(lo + 1e-9, hi - 1e-9, la + 1e-9, ha - 1e-9)
    assert(cover.nonEmpty)
    assert(cover.forall(_.startsWith("d")))
    // a hemispheric box gets a multi-cell cover, not a full scan
    val wide = GeoHashOps.coverFromBBox(-170, 170, -80, 80)
    assert(wide.nonEmpty && !wide.contains(""))
  }

  test("coverFromBBox never exceeds the budget: over-budget subdivision keeps the coarser level") {
    // the hemispheric box intersects ~32 level-1 cells whose children
    // blow any small budget — the cover must stay at the current level
    val cover = GeoHashOps.coverFromBBox(-170, 170, -80, 80, maxHashes = 8)
    assert(cover.size <= 8 || cover.forall(_.length == 1),
      s"budget 8 produced ${cover.size} prefixes at lengths ${cover.map(_.length).distinct}")
    val bigger = GeoHashOps.coverFromBBox(-170, 170, -80, 80, maxHashes = 32)
    assert(bigger.size <= 32)
  }

  test("calculatePrecision matches the log2 formula on the planner cases") {
    assert(GeoHashOps.calculatePrecision(-90.0, -67.5, 22.5, 45.0) === 7)
    // whole world: round(log2(1)+log2(1)) = 0 -> None upstream
    assert(GeoHashOps.calculatePrecision(-180, 180, -90, 90) === 0)
  }
}
