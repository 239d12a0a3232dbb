package graft.cells

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/**
 * Property tests (seeded-random, deterministic) for the range-cover
 * machinery — the soundness guarantee every index scan rests on: an
 * element intersecting the query window MUST fall inside some emitted
 * range, at any budget. Example-based oracles can't sweep this input
 * space; the XZ boundary-touch bug fixed in round 3 (`<=` vs `<`
 * disjointness) is exactly the class of defect these catch.
 */
class CoverPropertiesSpec extends AnyFunSuite {

  private def covered(ranges: Seq[IndexRange], v: Long): Boolean =
    ranges.exists(r => v >= r.lower && v <= r.upper)

  private def checkInvariants(ranges: Seq[IndexRange]): Unit = {
    ranges.foreach(r => assert(r.lower <= r.upper))
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a.upper < b.lower, s"overlap/unsorted: $a then $b")
      case _ =>
    }
  }

  test("z2 cover: sorted disjoint ranges; every point in the window is covered") {
    val rnd = new Random(20260820L)
    val bits = 16
    val n = 1 << bits
    for (_ <- 0 until 300; budget <- Seq(8, 64, 2048)) {
      val x0 = rnd.nextInt(n); val x1 = x0 + rnd.nextInt(n - x0)
      val y0 = rnd.nextInt(n); val y1 = y0 + rnd.nextInt(n - y0)
      val ranges = ZRangeCover.z2Ranges(x0, y0, x1, y1, bitsPerDim = bits, maxRanges = budget)
      checkInvariants(ranges)
      for (_ <- 0 until 10) {
        val px = x0 + rnd.nextInt(x1 - x0 + 1)
        val py = y0 + rnd.nextInt(y1 - y0 + 1)
        assert(covered(ranges, Z2.index(px, py)),
          s"z2 point ($px,$py) escaped cover of [$x0,$x1]x[$y0,$y1] budget $budget")
      }
    }
  }

  test("z3 cover: every point in the box is covered at any budget") {
    val rnd = new Random(31337L)
    val bits = 10
    val n = 1 << bits
    for (_ <- 0 until 300; budget <- Seq(8, 512)) {
      val x0 = rnd.nextInt(n); val x1 = x0 + rnd.nextInt(n - x0)
      val y0 = rnd.nextInt(n); val y1 = y0 + rnd.nextInt(n - y0)
      val t0 = rnd.nextInt(n); val t1 = t0 + rnd.nextInt(n - t0)
      val ranges = ZRangeCover.z3Ranges(x0, y0, t0, x1, y1, t1,
        bitsPerDim = bits, maxRanges = budget)
      checkInvariants(ranges)
      for (_ <- 0 until 10) {
        val px = x0 + rnd.nextInt(x1 - x0 + 1)
        val py = y0 + rnd.nextInt(y1 - y0 + 1)
        val pt = t0 + rnd.nextInt(t1 - t0 + 1)
        assert(covered(ranges, Z3.index(px, py, pt)),
          s"z3 point escaped cover (budget $budget)")
      }
    }
  }

  test("xz2 cover: every intersecting element's code is covered (incl. boundary touch)") {
    val rnd = new Random(987654321L)
    val xz = XZ2(12)
    def rect(): (Double, Double, Double, Double) = {
      val x0 = rnd.nextDouble() * 350 - 180
      val y0 = rnd.nextDouble() * 170 - 90
      // mixed sizes: tiny elements stress deep levels, large ones level 1-3
      val w = math.pow(10, rnd.nextDouble() * 3 - 2) // 0.01 .. 10 degrees
      (x0, y0, math.min(180, x0 + w * (0.2 + rnd.nextDouble())),
        math.min(90, y0 + w * (0.2 + rnd.nextDouble())))
    }
    var tested = 0
    for (_ <- 0 until 1000; budget <- Seq(16, 2048)) {
      val q = rect()
      // elements scatter AROUND the query (mix of hits and misses)
      val ex0 = q._1 + (rnd.nextDouble() * 2 - 0.7) * (q._3 - q._1 + 1)
      val ey0 = q._2 + (rnd.nextDouble() * 2 - 0.7) * (q._4 - q._2 + 1)
      val e = (math.max(-180, ex0), math.max(-90, ey0),
        math.min(180, ex0 + math.pow(10, rnd.nextDouble() * 3 - 2)),
        math.min(90, ey0 + math.pow(10, rnd.nextDouble() * 3 - 2)))
      val valid = e._1 <= e._3 && e._2 <= e._4
      val intersects = valid && e._1 <= q._3 && e._3 >= q._1 && e._2 <= q._4 && e._4 >= q._2
      if (intersects) {
        tested += 1
        val code = xz.index(e._1, e._2, e._3, e._4)
        val ranges = xz.ranges(q._1, q._2, q._3, q._4, maxRanges = budget)
        assert(covered(ranges, code),
          s"xz2 element $e escaped cover of $q (budget $budget)")
      }
    }
    assert(tested > 200) // the generator must actually exercise the property
  }

  test("xz2 cover: exact boundary touch on cell edges is covered") {
    val xz = XZ2(12)
    // element exactly touching the query's max edge at a power-of-two
    // cell boundary — the <= vs < disjointness regression
    for (k <- 1 to 8) {
      val b = 180.0 / (1 << k) // a level-k cell boundary in lon
      val q = (-10.0, -10.0, b, 10.0)
      val e = (b, -5.0, b + 0.5, 5.0) // starts exactly at the boundary
      val code = xz.index(e._1, e._2, e._3, e._4)
      val ranges = xz.ranges(q._1, q._2, q._3, q._4)
      assert(covered(ranges, code), s"boundary-touch element at lon=$b escaped")
    }
  }

  test("xz3 cover: every intersecting element x interval is covered") {
    val rnd = new Random(55555L)
    val xz = XZ3(10, BinnedTime.Week)
    val maxOff = BinnedTime.maxOffset(BinnedTime.Week)
    var tested = 0
    for (_ <- 0 until 1500) {
      val qx0 = rnd.nextDouble() * 300 - 180
      val qy0 = rnd.nextDouble() * 150 - 90
      val qt0 = (rnd.nextDouble() * maxOff * 0.8).toLong
      val q = (qx0, qy0, qt0,
        math.min(180, qx0 + 5 + rnd.nextDouble() * 40),
        math.min(90, qy0 + 5 + rnd.nextDouble() * 40),
        math.min(maxOff, qt0 + (maxOff * 0.2 * rnd.nextDouble()).toLong + 1))
      // element scattered around the query box
      val ex0 = q._1 + (rnd.nextDouble() * 2 - 0.7) * (q._4 - q._1)
      val ey0 = q._2 + (rnd.nextDouble() * 2 - 0.7) * (q._5 - q._2)
      val et0 = math.max(0L, q._3 + ((rnd.nextDouble() * 2 - 0.7) * (q._6 - q._3)).toLong)
      val e = (math.max(-180, ex0), math.max(-90, ey0), et0,
        math.min(180, ex0 + math.pow(10, rnd.nextDouble() * 3 - 2)),
        math.min(90, ey0 + math.pow(10, rnd.nextDouble() * 3 - 2)),
        math.min(maxOff, et0 + (maxOff * 0.02 * rnd.nextDouble()).toLong))
      val valid = e._1 <= e._4 && e._2 <= e._5 && e._3 <= e._6
      val intersects = valid && e._1 <= q._4 && e._4 >= q._1 && e._2 <= q._5 && e._5 >= q._2 &&
        e._3 <= q._6 && e._6 >= q._3
      if (intersects) {
        tested += 1
        val code = xz.index(e._1, e._2, e._3, e._4, e._5, e._6)
        val ranges = xz.ranges(q._1, q._2, q._3, q._4, q._5, q._6)
        assert(covered(ranges, code), s"xz3 element $e escaped cover of $q")
      }
    }
    assert(tested > 100)
  }

  test("binned time: toBinned/fromBinned round-trips to offset precision; bins are monotone") {
    val rnd = new Random(424242L)
    val periods = Seq(BinnedTime.Day, BinnedTime.Week, BinnedTime.Month, BinnedTime.Year)
    for (_ <- 0 until 2000; p <- periods) {
      val millis = math.abs(rnd.nextLong() % (50L * 366 * 86400000L)) // 1970..~2020
      val b = BinnedTime.toBinned(p, millis)
      val unit = p match {
        case BinnedTime.Day => 1L
        case BinnedTime.Week | BinnedTime.Month => 1000L
        case _ => 60000L
      }
      val back = BinnedTime.fromBinned(p, b)
      assert(back == millis - millis % unit || back == millis / unit * unit,
        s"$p: $millis -> $b -> $back")
      assert(b.offset >= 0 && b.offset <= BinnedTime.maxOffset(p),
        s"$p offset ${b.offset} out of range for $millis")
      // monotone: a later instant never gets a smaller (bin, offset)
      val millis2 = millis + 1 + math.abs(rnd.nextInt(86400000))
      val b2 = BinnedTime.toBinned(p, millis2)
      assert(b2.bin > b.bin || (b2.bin == b.bin && b2.offset >= b.offset))
    }
  }

  test("packed cells: pack/ix/iy/res round-trip and envelope contains its point") {
    val rnd = new Random(13L)
    for (_ <- 0 until 3000) {
      val r = rnd.nextInt(Cells.MaxRes + 1)
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val c = Cells.cell(lon, lat, r)
      assert(Cells.res(c) == r)
      assert(Cells.pack(r, Cells.ix(c), Cells.iy(c)) == c)
      val (x0, y0, x1, y1) = Cells.envelope(c)
      assert(lon >= x0 - 1e-9 && lon <= x1 + 1e-9 && lat >= y0 - 1e-9 && lat <= y1 + 1e-9,
        s"point ($lon,$lat) outside envelope of its own cell at res $r")
    }
  }

  test("z-curve: index/invert round-trips at full precision") {
    val rnd = new Random(99L)
    for (_ <- 0 until 5000) {
      val x = rnd.nextLong() & ((1L << 31) - 1)
      val y = rnd.nextLong() & ((1L << 31) - 1)
      val z = Z2.index(x, y)
      assert(Z2.invertX(z) == x && Z2.invertY(z) == y)
      val x3 = rnd.nextLong() & ((1L << 21) - 1)
      val y3 = rnd.nextLong() & ((1L << 21) - 1)
      val t3 = rnd.nextLong() & ((1L << 21) - 1)
      val z3 = Z3.index(x3, y3, t3)
      assert(Z3.invertX(z3) == x3 && Z3.invertY(z3) == y3 && Z3.invertT(z3) == t3)
    }
  }

  test("cell cover: every point in the bbox lands in an emitted cell") {
    val rnd = new Random(777L)
    for (_ <- 0 until 300) {
      val x0 = rnd.nextDouble() * 350 - 180
      val y0 = rnd.nextDouble() * 170 - 90
      val x1 = math.min(180, x0 + rnd.nextDouble() * 20)
      val y1 = math.min(90, y0 + rnd.nextDouble() * 20)
      val r = 3 + rnd.nextInt(8)
      val cells = Cells.coverBBox(x0, y0, x1, y1, r).toSet
      // coverBBox coarsens under its cell budget: membership is checked
      // at the resolution it actually returned
      val rr = Cells.res(cells.head)
      assert(rr <= r)
      for (_ <- 0 until 10) {
        val px = x0 + rnd.nextDouble() * (x1 - x0)
        val py = y0 + rnd.nextDouble() * (y1 - y0)
        assert(cells.contains(Cells.cell(px, py, rr)),
          s"point ($px,$py) res $rr escaped coverBBox($x0,$y0,$x1,$y1)")
      }
    }
  }
}
