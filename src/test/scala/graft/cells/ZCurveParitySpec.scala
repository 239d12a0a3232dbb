package graft.cells

import org.scalatest.funsuite.AnyFunSuite

/**
 * Ports the reference geomesa-z3 curve suites' CONCRETE cases (not just
 * their patterns — CellsSpec carries those) against our kernels:
 *
 *  - Z2Test.scala "split" (:66-77): exact bit-spread values
 *  - Z2Test/Z3Test apply-unapply at min/max dimension values
 *  - XZ2SFCTest.scala (:24-104): the containing/overlapping/disjoint
 *    query matrix for an indexed polygon and point at g=12
 *  - XZ3SFCTest.scala (:25-64): the same matrix with a time dimension
 *
 * Deviation noted: the reference THROWS on out-of-bounds lon/lat
 * ("fail for out-of-bounds values"); our kernels clamp instead, because
 * they run inside executor hot loops where a single bad row must not
 * kill a 10^12-row job (the row is still findable: clamped cells land
 * on the world edge). The clamping behavior is asserted here so the
 * choice stays deliberate.
 */
class ZCurveParitySpec extends AnyFunSuite {

  private def padTo62(s: String): String = ("0" * 62 + s).takeRight(62)

  test("Z2.split spreads each bit to even positions (reference Z2Test 'split' values)") {
    val splits = Seq(0x00000000ffffffL, 0x00000000000000L, 0x00000000000001L,
      0x000000000c0f02L, 0x00000000000802L)
    for (l <- splits) {
      val expected = padTo62(new String(l.toBinaryString.toCharArray.flatMap(c => s"0$c")))
      assert(padTo62(Z2.split(l).toBinaryString) == expected, s"split($l)")
    }
  }

  test("Z2/Z3 index/invert at min and max dimension values (reference apply/unapply cases)") {
    for ((x, y) <- Seq((0L, 0L), (Z2.MaxMask, Z2.MaxMask))) {
      val z = Z2.index(x, y)
      assert(Z2.invertX(z) == x && Z2.invertY(z) == y)
    }
    for ((x, y, t) <- Seq((0L, 0L, 0L), (Z3.MaxMask, Z3.MaxMask, Z3.MaxMask))) {
      val z = Z3.index(x, y, t)
      assert(Z3.invertX(z) == x && Z3.invertY(z) == y && Z3.invertT(z) == t)
    }
  }

  test("XZ2 polygon query matrix (reference XZ2SFCTest 'index polygons and query them')") {
    val sfc = XZ2(12)
    val poly = sfc.index(10, 10, 12, 12)
    val containing = Seq((9.0, 9.0, 13.0, 13.0), (-180.0, -90.0, 180.0, 90.0),
      (0.0, 0.0, 180.0, 90.0), (0.0, 0.0, 20.0, 20.0))
    val overlapping = Seq((11.0, 11.0, 13.0, 13.0), (9.0, 9.0, 11.0, 11.0),
      (10.5, 10.5, 11.5, 11.5), (11.0, 11.0, 11.0, 11.0))
    val disjoint = Seq((-180.0, -90.0, 8.0, 8.0), (0.0, 0.0, 8.0, 8.0),
      (9.0, 9.0, 9.5, 9.5), (20.0, 20.0, 180.0, 90.0))
    for (b <- containing ++ overlapping) {
      val rs = sfc.ranges(b._1, b._2, b._3, b._4)
      assert(rs.exists(r => r.lower <= poly && r.upper >= poly), s"$b should match")
    }
    for (b <- disjoint) {
      val rs = sfc.ranges(b._1, b._2, b._3, b._4)
      assert(!rs.exists(r => r.lower <= poly && r.upper >= poly), s"$b should not match")
    }
  }

  test("XZ2 point query matrix (reference XZ2SFCTest 'index points and query them')") {
    val sfc = XZ2(12)
    val pt = sfc.index(11, 11, 11, 11)
    val matching = Seq(
      (9.0, 9.0, 13.0, 13.0), (-180.0, -90.0, 180.0, 90.0),
      (0.0, 0.0, 180.0, 90.0), (0.0, 0.0, 20.0, 20.0),
      (11.0, 11.0, 13.0, 13.0), (9.0, 9.0, 11.0, 11.0),
      (10.5, 10.5, 11.5, 11.5), (11.0, 11.0, 11.0, 11.0))
    val disjoint = Seq(
      (-180.0, -90.0, 8.0, 8.0), (0.0, 0.0, 8.0, 8.0), (9.0, 9.0, 9.5, 9.5),
      (12.5, 12.5, 13.5, 13.5), (20.0, 20.0, 180.0, 90.0))
    for (b <- matching) {
      val rs = sfc.ranges(b._1, b._2, b._3, b._4)
      assert(rs.exists(r => r.lower <= pt && r.upper >= pt), s"$b should match")
    }
    for (b <- disjoint) {
      val rs = sfc.ranges(b._1, b._2, b._3, b._4)
      assert(!rs.exists(r => r.lower <= pt && r.upper >= pt), s"$b should not match")
    }
  }

  test("XZ3 polygon query matrix (reference XZ3SFCTest, g=12 week period)") {
    val sfc = XZ3(12, BinnedTime.Week)
    val poly = sfc.index(10, 10, 1000L, 12, 12, 1000L)
    val matching = Seq(
      (9.0, 9.0, 900L, 13.0, 13.0, 1100L),
      (-180.0, -90.0, 900L, 180.0, 90.0, 1100L),
      (0.0, 0.0, 900L, 180.0, 90.0, 1100L),
      (0.0, 0.0, 900L, 20.0, 20.0, 1100L),
      (11.0, 11.0, 900L, 13.0, 13.0, 1100L),
      (9.0, 9.0, 900L, 11.0, 11.0, 1100L),
      (10.5, 10.5, 900L, 11.5, 11.5, 1100L),
      (11.0, 11.0, 900L, 11.0, 11.0, 1100L))
    val disjoint = Seq(
      (-180.0, -90.0, 900L, 8.0, 8.0, 1100L),
      (0.0, 0.0, 900L, 8.0, 8.0, 1100L),
      (9.0, 9.0, 900L, 9.5, 9.5, 1100L),
      (20.0, 20.0, 900L, 180.0, 90.0, 1100L))
    for (b <- matching) {
      val rs = sfc.ranges(b._1, b._2, b._3, b._4, b._5, b._6, maxRanges = 10000)
      assert(rs.exists(r => r.lower <= poly && r.upper >= poly), s"$b should match")
    }
    for (b <- disjoint) {
      val rs = sfc.ranges(b._1, b._2, b._3, b._4, b._5, b._6, maxRanges = 10000)
      assert(!rs.exists(r => r.lower <= poly && r.upper >= poly), s"$b should not match")
    }
  }

  test("out-of-bounds inputs clamp to the world edge (documented deviation: reference throws)") {
    val sfc = XZ2(12)
    assert(sfc.index(-180.1, 0, -179.9, 1) == sfc.index(-180.0, 0, -179.9, 1))
    assert(sfc.index(179.9, 0, 180.1, 1) == sfc.index(179.9, 0, 180.0, 1))
    val z = Z2.index(Z2.MaxMask + 5, 0) // masked, not garbage
    assert(Z2.invertX(z) == ((Z2.MaxMask + 5) & Z2.MaxMask))
  }
}
