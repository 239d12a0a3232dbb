package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.GeomOps

/**
 * Ports the reference's BinnedArray fixtures
 * (geomesa-utils/.../stats/BinnedArrayTest.scala:20-276) onto Binned.
 */
class BinnedSpec extends AnyFunSuite {

  test("bin integers / longs: exact integral edges") {
    val b = Binned.LongBins(10, 0L, 99L)
    (0 to 99).foreach(i => assert(b.indexOf(i.toLong) == i / 10, s"value $i"))
    // medians from the reference fixture (note the round-down above bin 4)
    assert((0 until 10).map(b.medianValue) == Seq(5L, 15L, 25L, 35L, 45L, 54L, 64L, 74L, 84L, 94L))
    (0 until 10).foreach(i => assert(b.boundsOf(i) == (i * 10L, i * 10L + 9L)))
    assert(b.indexOf(-1L) == -1 && b.indexOf(100L) == -1)
    assert(b.isBelow(-1L) && !b.isBelow(0L))
  }

  test("bin floats / doubles: continuous edges, upper bound clamps") {
    val b = Binned.DoubleBins(10, 0.0, 1.0)
    for (bin <- 0 to 9; i <- 1 to 9)
      assert(b.indexOf(bin * 0.1 + 0.01 * i) == bin, s"bin $bin value ${bin * 0.1 + 0.01 * i}")
    assert(b.indexOf(1.0) == 9) // upper bound clamps into the last bin
    (0 until 10).foreach { i =>
      assert(math.abs(b.medianValue(i) - (0.05 + 0.1 * i)) < 1e-3)
      val (lo, hi) = b.boundsOf(i)
      assert(math.abs(lo - 0.1 * i) < 1e-3 && math.abs(hi - 0.1 * (i + 1)) < 1e-3)
    }
    assert(b.indexOf(-0.01) == -1 && b.indexOf(1.01) == -1)
    // NaN is out of range, not bin 0 (matches the Column form's NULL)
    assert(b.indexOf(Double.NaN) == -1)
  }

  test("bin dates: hour-wide bins over a 10-hour range") {
    def t(hh: Int, mm: Int): Long =
      java.time.Instant.parse(f"2016-01-01T$hh%02d:$mm%02d:00Z").toEpochMilli
    val b = Binned.LongBins(10, t(0, 0), t(10, 0))
    for (hh <- 0 to 9; mm <- 0 to 59) assert(b.indexOf(t(hh, mm)) == hh)
    (0 until 10).foreach { i =>
      assert(b.medianValue(i) == t(i, 30))
      assert(b.boundsOf(i) == (t(i, 0), t(i + 1, 0)))
    }
  }

  test("date bounds never out of order (5ms over 10 bins)") {
    val base = java.time.Instant.parse("2016-01-01T00:00:00Z").toEpochMilli
    val b = Binned.LongBins(10, base, base + 5)
    (0 until 10).foreach { i =>
      val (lo, hi) = b.boundsOf(i)
      assert(lo <= hi)
      assert(b.indexOf(lo) <= b.indexOf(hi))
    }
  }

  test("bin strings: base-36 significant digits after the common prefix") {
    val b = Binned.StringBins(36, "aa0", "aaz")
    // the fixture's suffix ('0'+12).toChar = '<' is non-alphanumeric and
    // normalizes to the lowest base-36 digit
    val suffix = ('0' + 12).toChar
    (0 until 10).foreach(i => assert(b.indexOf("aa" + ('0' + i).toChar + suffix) == i))
    (0 until 25).foreach(i => assert(b.indexOf("aa" + ('a' + i).toChar + suffix) == i + 10))
    assert(b.indexOf("aaz") == 35)
    (1 until 10).foreach(i => assert(b.medianValue(i).startsWith(s"aa$i")))
    (10 until 15).foreach(i => assert(b.medianValue(i).startsWith("aa" + ('a'.toInt + i - 10).toChar)))
  }

  test("bin strings with different length endpoints") {
    val b = Binned.StringBins(100, "Addams", "Clemens")
    assert(b.indexOf("Addams") == 0)
    assert(b.indexOf("Clemens") == 99)
  }

  test("string bounds never out of order") {
    val bounds = Seq(("0", "z"), ("0name0", "9nrcyk5rcykg"), ("abc000", "abc099"))
    bounds.foreach { case (lo, hi) =>
      val b = Binned.StringBins(1000, lo, hi)
      (0 until 1000).foreach { i =>
        val (bl, bh) = b.boundsOf(i)
        assert(b.indexOf(bl) <= b.indexOf(bh), s"bounds ($lo,$hi) bin $i")
      }
    }
  }

  test("bin points: z2-centroid bins, distinct medians") {
    def p(x: Double, y: Double): Array[Byte] =
      GeomOps.toWkb(GeomOps.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x, y)))
    val b = Binned.GeometryBins(4, p(-180, -90), p(180, 90))
    for (i <- 1 to 18; j <- 1 to 9; sx <- Seq(-1, 1); sy <- Seq(-1, 1)) {
      val idx = b.indexOf(p(sx * 10.0 * i, sy * 10.0 * j))
      assert(idx >= 0 && idx <= 3, s"point ${sx * 10 * i},${sy * 10 * j}")
    }
    val medians = (0 until 4).map(i => GeomOps.fromWkb(b.medianValue(i)).toString)
    assert(medians.distinct.size == 4)
    // non-point geometries bin by centroid
    val poly = GeomOps.toWkb(GeomOps.fromWkt("POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"))
    assert(b.indexOf(poly) == b.indexOf(p(15, 15)))
  }

  test("geometry bounds never out of order") {
    val lo = GeomOps.toWkb(GeomOps.fromWkt("POINT (-87.04006865017121 15.836863706743756)"))
    val hi = GeomOps.toWkb(GeomOps.fromWkt("POINT (-64.42119213027004 52.51324361307232)"))
    val b = Binned.GeometryBins(10, lo, hi)
    (0 until 10).foreach { i =>
      val (bl, bh) = b.boundsOf(i)
      assert(b.indexOf(bl) <= b.indexOf(bh), s"bin $i")
    }
  }
}
