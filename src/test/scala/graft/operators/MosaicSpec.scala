package graft.operators

import graft.operators.Mosaic.{Chunk, Grid}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Port of the reference's MosaicTest
 * (geomesa-accumulo-raster/.../util/MosaicTest.scala) and the kernel
 * halves of QueryAndMosaicTest — the same 256x256 solid chunks and
 * 16x16 split/solid fixtures (RasterTestsUtils.scala:146-216), with
 * pixel-exact assertions wherever no resampling is involved.
 */
class MosaicSpec extends AnyFunSuite {

  private val white = 255
  private val lightGray = 200
  private val darkGray = 54
  private val herring = 42

  private def chunk(minX: Double, maxX: Double, minY: Double, maxY: Double,
                    color: Int, w: Int = 256, h: Int = 256): Chunk =
    Chunk(minX, minY, maxX, maxY, Mosaic.solid(w, h, color))

  /** testRasterIntVSplit: left 8 columns 1, right 8 columns 2. */
  private def vsplit16: Grid = {
    val px = Array.tabulate(16 * 16)(i => if (i % 16 < 8) 1 else 2)
    Grid(16, 16, px)
  }

  private def fourAdjacent: Seq[Chunk] = Seq(
    chunk(-50, 0, 0, 50, lightGray),
    chunk(0, 50, 0, 50, darkGray),
    chunk(0, 50, -50, 0, lightGray),
    chunk(-50, 0, -50, 0, darkGray))

  test("two adjacent rasters, equal extent and equal resolution") {
    val cs = Seq(chunk(-50, 0, 0, 50, darkGray), chunk(0, 50, 0, 50, white))
    val (m, n) = Mosaic.mosaicChunks(cs.iterator, 512, 256, -50, 0, 50, 50)
    assert(n === 2)
    val g = m.get
    assert(g.w === 512 && g.h === 256)
    // native canvas is 512x256 with no resample: exact halves
    assert(g(0, 0) === darkGray && g(255, 255) === darkGray)
    assert(g(256, 0) === white && g(511, 255) === white)
  }

  test("four rasters, larger extent, finer / equal / coarser resolutions keep the query dims") {
    for (dim <- Seq(800, 614, 307)) {
      val (m, n) = Mosaic.mosaicChunks(fourAdjacent.iterator, dim, dim, -60, -60, 60, 60)
      assert(n === 4)
      assert(m.get.w === dim && m.get.h === dim)
      // only chunk colors and the empty background appear
      assert(m.get.pixels.forall(p => p == lightGray || p == darkGray || p == 0))
    }
  }

  test("four rasters, equal extent: quadrant colors are exact at the native size") {
    val (m, n) = Mosaic.mosaicChunks(fourAdjacent.iterator, 512, 512, -50, -50, 50, 50)
    assert(n === 4)
    val g = m.get
    assert(g.w === 512 && g.h === 512)
    // row 0 is maxY: NW=lightGray NE=darkGray; row 511 is minY: SW=darkGray SE=lightGray
    assert(g(100, 100) === lightGray && g(400, 100) === darkGray)
    assert(g(100, 400) === darkGray && g(400, 400) === lightGray)
    // exact seams
    assert(g(255, 255) === lightGray && g(256, 255) === darkGray)
    assert(g(255, 256) === darkGray && g(256, 256) === lightGray)
  }

  test("four rasters, equal extent, finer and coarser resolutions keep dims and colors") {
    for (dim <- Seq(800, 64)) {
      val (m, _) = Mosaic.mosaicChunks(fourAdjacent.iterator, dim, dim, -50, -50, 50, 50)
      assert(m.get.w === dim && m.get.h === dim)
      assert(m.get.pixels.forall(p => p == lightGray || p == darkGray))
    }
  }

  test("four rasters, smaller extent (one quadrant interior) is a single color") {
    val (m, _) = Mosaic.mosaicChunks(fourAdjacent.iterator, 800, 800, -25, -25, 25, 25)
    val g = m.get
    assert(g.w === 800 && g.h === 800)
    assert(g(100, 100) === lightGray) // NW quadrant of the query = chunk 1
    assert(g(700, 100) === darkGray)
    assert(g(100, 700) === darkGray)
    assert(g(700, 700) === lightGray)
  }

  test("single chunk, same extent: the stored tile comes back pixel-exact") {
    val b = (-77.1152343750, 43.001220703125, -77.104248046875, 43.0122070313125)
    val c = Chunk(b._1, b._2, b._3, b._4, vsplit16)
    val (m, n) = Mosaic.mosaicChunks(Iterator(c), 16, 16, b._1, b._2, b._3, b._4)
    assert(n === 1)
    assert(m.get.pixels.sameElements(vsplit16.pixels))
  }

  test("8 adjacent red herrings contribute nothing to an interior query") {
    // QueryAndMosaicTest:86-103 — the center tile plus its 8 neighbors;
    // a query of (almost) the center's extent returns only center pixels
    val cx = (-77.1152343750, 43.001220703125, -77.104248046875, 43.0122070313125)
    val dx = cx._3 - cx._1
    val dy = cx._4 - cx._2
    val center = Chunk(cx._1, cx._2, cx._3, cx._4, vsplit16)
    val neighbors = for {
      i <- Seq(-1, 0, 1); j <- Seq(-1, 0, 1) if i != 0 || j != 0
    } yield Chunk(cx._1 + i * dx, cx._2 + j * dy, cx._3 + i * dx, cx._4 + j * dy,
      Mosaic.solid(16, 16, herring))
    // the reference's lessPreciseQBox: the same box at lower precision
    val q = (-77.1152343750, 43.0012207031, -77.1042480469, 43.0122070313)
    val (m, _) = Mosaic.mosaicChunks((center +: neighbors).iterator, 16, 16, q._1, q._2, q._3, q._4)
    assert(m.get.pixels.sameElements(vsplit16.pixels))
  }

  test("crop honors the reference's round/floor/ceil pixel arithmetic") {
    val c = chunk(0, 10, 0, 10, white, w = 10, h = 10) // 1 degree/pixel
    // half the chunk: exact 5x10 window
    assert(Mosaic.crop(c, 0, 0, 5, 10).get.w === 5)
    // sub-half-pixel sliver rounds to zero pixels -> None
    assert(Mosaic.crop(c, 0, 0, 0.4, 10) === None)
    // just over half a pixel rounds to 1 -> Some
    assert(Mosaic.crop(c, 0, 0, 0.6, 10).get.w === 1)
    // identical envelope short-circuits to the stored grid
    assert(Mosaic.crop(c, 0, 0, 10, 10).get eq c.grid)
    // disjoint -> None
    assert(Mosaic.crop(c, 20, 20, 30, 30) === None)
  }

  test("scale is identity at equal size and exact on solid regions") {
    val g = vsplit16
    assert(Mosaic.scale(g, 16, 16) eq g)
    val up = Mosaic.scale(g, 32, 32)
    assert(up(0, 0) === 1 && up(31, 31) === 2 && up(15, 0) === 1 && up(16, 0) === 2)
    val down = Mosaic.scale(g, 4, 4)
    assert(down(0, 0) === 1 && down(3, 3) === 2)
  }

  test("empty iterator yields no mosaic") {
    assert(Mosaic.mosaicChunks(Iterator.empty, 16, 16, 0, 0, 1, 1) === ((None, 0)))
  }
}
