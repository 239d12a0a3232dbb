package graft.cells

import org.scalatest.funsuite.AnyFunSuite

/** Ported from the reference's GeoHashTest
  * (geomesa-utils/.../geohash/GeoHashTest.scala:33-265): bit-precision
  * encode/decode, bitset form, grid indices, containment, spans. */
class GeoHashSpec extends AnyFunSuite {

  private def xTol(prec: Int) = 360.0 * math.pow(0.5, math.floor(prec / 2.0))
  private def yTol(prec: Int) = xTol(prec) * 0.5

  test("rectangle iteration over a parent bbox yields exactly its children " +
      "(RectangleGeoHashIteratorTest testCorners)") {
    // the reference's fixture: 9q8ys0's bbox at 35 bits -> 32 cells, every
    // center inside the bbox
    val parent = GeoHash("9q8ys0")
    val (lonMin, latMin, lonMax, latMax) = parent.bbox
    val cells = GeoHash.rectangle(latMin, lonMin, latMax, lonMax, 35)
    assert(cells.length == 32)
    cells.foreach { gh =>
      assert(gh.y >= latMin && gh.y <= latMax, s"latitude out of range: $gh")
      assert(gh.x >= lonMin && gh.x <= lonMax, s"longitude out of range: $gh")
      assert(parent.contains(gh), s"not a child of the parent: $gh")
    }
    assert(cells.map(_.hash).distinct.length == 32)
    // a rectangle strictly inside one cell yields that single cell
    val one = GeoHash.rectangle(parent.y - 1e-9, parent.x - 1e-9,
      parent.y + 1e-9, parent.x + 1e-9, 30)
    assert(one.map(_.hash) == Seq("9q8ys0"))
  }

  test("ezs42 decodes to -5.6, 42.6") {
    val gh = GeoHash("ezs42")
    assert(math.abs(gh.x - -5.6) < xTol(25))
    assert(math.abs(gh.y - 42.6) < yTol(25))
  }

  test("-5.6, 42.6 hashes to ezs42 at 25 bits") {
    val gh = GeoHash(-5.6, 42.6, 25)
    assert(math.abs(gh.x - -5.60302734375) < xTol(25))
    assert(math.abs(gh.y - 42.60498046875) < yTol(25))
    assert(gh.prec == 25)
    assert(gh.bbox == ((-5.625, 42.5830078125, -5.5810546875, 42.626953125)))
    assert(gh.bitset == Set(1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 17, 23))
    assert(gh.hash == "ezs42")
  }

  test("-78, 38 hashes to dqb81 at 25 bits") {
    val gh = GeoHash(-78, 38, 25)
    assert(math.abs(gh.x - -77.98095703125) < xTol(25))
    assert(math.abs(gh.y - 37.99072265625) < yTol(25))
    assert(gh.bbox == ((-78.0029296875, 37.96875, -77.958984375, 38.0126953125)))
    assert(gh.bitset == Set(1, 2, 5, 7, 8, 11, 13, 16, 24))
    assert(gh.hash == "dqb81")
  }

  test("-78, 38 hashes to dqb81h at 27 bits") {
    val gh = GeoHash(-78, 38, 27)
    assert(math.abs(gh.x - -77.991943359375) < xTol(27))
    assert(math.abs(gh.y - 38.001708984375) < yTol(27))
    assert(gh.prec == 27)
    assert(gh.bbox == ((-78.0029296875, 37.99072265625, -77.98095703125, 38.0126953125)))
    assert(gh.bitset == Set(1, 2, 5, 7, 8, 11, 13, 16, 24, 25))
    assert(gh.hash == "dqb81h")
  }

  test("-78, 38 hashes to dqb81jdn at 40 bits") {
    val gh = GeoHash(-78, 38, 40)
    assert(math.abs(gh.x - -78.0000114440918) < xTol(40))
    assert(math.abs(gh.y - 38.000078201293945) < yTol(40))
    assert(gh.bbox == ((-78.00018310546875, 37.99999237060547, -77.99983978271484, 38.00016403198242)))
    assert(gh.bitset == Set(1, 2, 5, 7, 8, 11, 13, 16, 24, 25, 29, 31, 32, 35, 37))
    assert(gh.hash == "dqb81jdn")
  }

  test("-78, 38 hashes to dqb81jdnh32t8 at 63 bits") {
    val gh = GeoHash(-78, 38, 63)
    assert(math.abs(gh.x - -78.00000000279397) < xTol(63))
    assert(math.abs(gh.y - 38.00000004004687) < yTol(63))
    assert(gh.bitset == Set(1, 2, 5, 7, 8, 11, 13, 16, 24, 25, 29, 31, 32, 35, 37,
      40, 48, 49, 53, 55, 56, 59, 61))
    assert(gh.hash == "dqb81jdnh32t8")
  }

  test("decode at explicit bit precision: dqb0c / dqb0cn@27 / dqb0cne4@40") {
    val a = GeoHash("dqb0c")
    assert(math.abs(a.x - -78.68408203125) < xTol(25))
    assert(math.abs(a.y - 38.12255859375) < yTol(25))
    val b = GeoHash("dqb0cn", 27)
    assert(math.abs(b.x - -78.695068359375) < xTol(27))
    assert(math.abs(b.y - 38.133544921875) < yTol(27))
    val c = GeoHash("dqb0cne4", 40)
    assert(math.abs(c.x - -78.70176315307617) < xTol(40))
    assert(math.abs(c.y - 38.13672065734863) < yTol(40))
  }

  test("encode/decode round-trip at every precision 20..63") {
    val (x, y) = (-78.0, 38.0)
    for (prec <- 20 to 63) {
      val enc = GeoHash(x, y, prec)
      assert(enc.x != x && enc.y != y) // centroid, not the input
      val dec = GeoHash(enc.hash, prec)
      assert(enc.toBinaryString == dec.toBinaryString)
      assert(enc.bbox == dec.bbox)
      assert(enc.hash == dec.hash)
      assert(enc.bitset == dec.bitset)
      assert(enc.prec == dec.prec)
      assert(math.abs(dec.x - x) < xTol(prec))
      assert(math.abs(dec.y - y) < yTol(prec))
    }
  }

  test("compose from grid bit indices") {
    assert(GeoHash.composeFromBitIndices(23248, 5232, 30).hash == "9q8ys0")
    assert(GeoHash.composeFromBitIndices(23248, 5232, 32).hash == "2ek7q00")
  }

  test("9q8ys0: bitset, precision, grid indices, bitset round-trip") {
    val gh = GeoHash("9q8ys0")
    assert(gh.bitset == Set(1, 4, 5, 7, 8, 11, 15, 16, 17, 18, 20, 21))
    assert(gh.prec == 30)
    assert(GeoHash.gridIndexForLatitude(gh) == 23248L)
    assert(GeoHash.gridIndexForLongitude(gh) == 5232L)
    assert(GeoHash.gridIndicesForLatLong(gh).toSeq == Seq(23248L, 5232L))
    assert(GeoHash.fromBits(Set(1, 4, 5, 7, 8, 11, 15, 16, 17, 18, 20, 21), 30) == gh)
  }

  test("containment is bit-prefix containment") {
    val large = GeoHash("dqb0", 18)
    val medium = GeoHash("dqb0", 20)
    val small = GeoHash("dqb0c")
    assert(large.contains(medium) && large.contains(small))
    assert(!medium.contains(large))
    assert(medium.contains(small))
    assert(!small.contains(medium) && !small.contains(large))
  }

  test("span counts between corner hashes") {
    assert(GeoHash.latitudeLongitudeSpanCount(GeoHash("dm"), GeoHash("dt"), 10) == ((1L, 2L)))
    assert(GeoHash.latitudeLongitudeSpanCount(GeoHash("dq"), GeoHash("dv"), 10) == ((2L, 3L)))
    assert(GeoHash.latitudeLongitudeSpanCount(GeoHash("dq"), GeoHash("dt"), 10) == ((2L, 2L)))
    assert(GeoHash.latitudeLongitudeSpanCount(GeoHash("du"), GeoHash("dy"), 10) == ((3L, 1L)))
  }

  test("binary-string codec round-trips") {
    val gh = GeoHash.fromBinaryString("01100101100101000000")
    assert(gh.hash == "dqb0")
    assert(gh.toBinaryString == "01100101100101000000")
    assert(GeoHash.fromBinaryString(GeoHash("dqb0").toBinaryString).hash == "dqb0")
  }

  test("domain edges land in the last cell") {
    assert(GeoHash(180.0, 0.5, 5).hash == "x")
    assert(GeoHash(180.0, 90.0, 5).hash == "z")
  }
}
