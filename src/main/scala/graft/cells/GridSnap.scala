package graft.cells

/**
 * Fixed-size raster grid over an envelope — the reference's GridSnap
 * (geomesa-utils/.../geotools/GridSnap.scala:16-120), the kernel its
 * DensityScan uses to rasterize geometries into a width×height heatmap
 * for a viewport. Coordinates snap to CELL CENTERS; index lookups
 * return -1 out of bounds and clamp the inclusive upper edge into the
 * last cell.
 *
 * This scalar form exists for parity tests and driver-side use;
 * the distributed path is [[graft.operators.Density.grid]], which
 * expresses the same snap as pure Catalyst arithmetic (codegen, no UDF).
 */
final case class GridSnap(minX: Double, minY: Double, maxX: Double, maxY: Double,
                          width: Int, height: Int) {
  require(width > 0 && height > 0, "grid must have positive dimensions")
  require(maxX > minX && maxY > minY, "envelope must be non-degenerate")

  val dx: Double = (maxX - minX) / width
  val dy: Double = (maxY - minY) / height

  /** Center X of column i. */
  def x(i: Int): Double = minX + dx / 2 + dx * i
  /** Center Y of row j. */
  def y(j: Int): Double = minY + dy / 2 + dy * j

  /** Column index of an X ordinate: -1 outside [minX, maxX]; the
    * inclusive right edge lands in the last column. */
  def i(xc: Double): Int =
    if (xc < minX || xc > maxX) -1
    else math.min(math.floor((xc - minX) / dx).toInt, width - 1)

  /** Row index of a Y ordinate (same rules as [[i]]). */
  def j(yc: Double): Int =
    if (yc < minY || yc > maxY) -1
    else math.min(math.floor((yc - minY) / dy).toInt, height - 1)

  /** Snap a coordinate to its cell center. CALLER FILTERS OUT-OF-BOUNDS
    * FIRST: like the reference, this composes x(i(xc)) without checking
    * the -1 sentinel, so an out-of-envelope coordinate yields a
    * fabricated center one cell outside the grid (the reference's
    * DensityScan filters to the envelope before snapping; Density.grid
    * does the same). */
  def snap(xc: Double, yc: Double): (Double, Double) = (x(i(xc)), y(j(yc)))

  /**
   * Bresenham rasterization between two CELL indices: distinct cells,
   * starting at (x0, y0), stepping the major axis once per emitted cell.
   * Emits max(|dx|,|dy|) cells (one for a degenerate segment) — the
   * reference's count contract (GridSnapTest "sequence of points"
   * expects 9 cells for (0,0)->(9,9)); its line rasterizer closes the
   * final cell by also rasterizing the reversed segment.
   */
  def bresenhamLine(x0: Int, y0: Int, x1: Int, y1: Int): Seq[(Int, Int)] = {
    val adx = math.abs(x1 - x0)
    val ady = math.abs(y1 - y0)
    val n = math.max(adx, ady)
    if (n == 0) Seq((x0, y0))
    else {
      val sx = if (x1 >= x0) 1 else -1
      val sy = if (y1 >= y0) 1 else -1
      val out = Vector.newBuilder[(Int, Int)]
      var cx = x0
      var cy = y0
      var err = 0.0
      val minorPerMajor = math.min(adx, ady).toDouble / n
      var k = 0
      while (k < n) {
        out += ((cx, cy))
        err += minorPerMajor
        val stepMinor = err >= 0.5
        if (stepMinor) err -= 1.0
        if (adx >= ady) { cx += sx; if (stepMinor) cy += sy }
        else { cy += sy; if (stepMinor) cx += sx }
        k += 1
      }
      out.result()
    }
  }
}
