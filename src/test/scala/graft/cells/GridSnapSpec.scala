package graft.cells

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's GridSnapTest
  * (geomesa-utils/src/test/.../geotools/GridSnapTest.scala:20-118):
  * cell-center snapping, index bounds, Bresenham counts, and the
  * no-floating-point-error round-trip. */
class GridSnapSpec extends AnyFunSuite {

  test("snaps to the middle of a grid cell (reference :28-55)") {
    val g = GridSnap(0.0, -4.0, 4.0, 0.0, 4, 4)
    assert((0 until 4).map(g.x) == Seq(0.5, 1.5, 2.5, 3.5))
    assert((0 until 4).map(g.y) == Seq(-3.5, -2.5, -1.5, -0.5))

    assert(g.snap(0, -4.0) == ((0.5, -3.5)))
    assert(g.snap(0.1, -3.9) == ((0.5, -3.5)))
    assert(g.snap(0.9, -3.1) == ((0.5, -3.5)))
    assert(g.snap(1.0, -3.0) == ((1.5, -2.5)))
    assert(g.snap(1.1, -2.9) == ((1.5, -2.5)))
    assert(g.snap(1.9, -2.1) == ((1.5, -2.5)))
    assert(g.snap(3.0, -1.0) == ((3.5, -0.5)))
    assert(g.snap(3.1, -0.9) == ((3.5, -0.5)))
    assert(g.snap(3.9, -0.1) == ((3.5, -0.5)))
    // inclusive upper edge lands in the LAST cell
    assert(g.snap(4.0, 0.0) == ((3.5, -0.5)))
  }

  test("min/max indices and out-of-bounds = -1 (reference :57-77)") {
    val g = GridSnap(0.0, 0.0, 10.0, 10.0, 100, 10)
    assert(g.i(0.0) == 0 && g.j(0.0) == 0)
    assert(g.i(10.0) == 99 && g.j(10.0) == 9)
    assert(g.i(-1.0) == -1 && g.j(-1.0) == -1)
    assert(g.i(11.0) == -1 && g.j(11.0) == -1)
  }

  test("bresenhamLine counts (reference :79-97)") {
    val g = GridSnap(0.0, 0.0, 10.0, 10.0, 10, 10)
    assert(g.bresenhamLine(0, 0, 9, 9).length == 9)
    assert(g.bresenhamLine(0, 0, 0, 9).length == 9)
    assert(g.bresenhamLine(0, 0, 9, 0).length == 9)
    assert(g.bresenhamLine(0, 0, 0, 0).length == 1)
    assert(g.bresenhamLine(9, 9, 0, 0).length == 9)
    // distinct cells, starts at the start cell
    val diag = g.bresenhamLine(0, 0, 9, 9)
    assert(diag.head == ((0, 0)) && diag.distinct == diag)
    assert(diag == (0 until 9).map(k => (k, k)))
  }

  test("no floating point errors: x(i(x(k))) == x(k) for every cell (reference :99-116)") {
    val g = GridSnap(0.0, 0.0, 10.0, 10.0, 100, 100)
    for (k <- 0 until 100) {
      assert(g.x(g.i(g.x(k))) == g.x(k))
      assert(g.y(g.j(g.y(k))) == g.y(k))
    }
  }
}
