package graft.cells

/**
 * XZ-ordering for spatial extents (lines/polygons), implemented from the
 * published construction (Boehm, Klump, Kriegel: "XZ-Ordering: A
 * Space-Filling Curve for Objects with Spatial Extension", SSD 1999).
 * The reference engine uses the same construction for its xz2 index
 * (/root/reference/geomesa-z3/.../curve/XZ2SFC.scala:24-417); this is an
 * independent implementation from the paper's definitions.
 *
 * An element's bbox (normalized to [0,1]^2) is assigned the deepest
 * quadtree level l whose *enlarged* cell (doubled width/height, anchored
 * at the cell containing the bbox min corner) still contains the bbox;
 * the code is the pre-order (depth-first) index of that cell in the
 * quadtree of max depth g.
 */
final case class XZ2(g: Int) {
  require(g > 0 && g <= 20, s"max resolution $g out of (0,20]")

  // subtreeSize(level) = number of nodes in a full quadtree subtree rooted
  // at a node at `level` (levels level..g) = (4^(g-level+1) - 1) / 3
  private val subtree: Array[Long] = {
    val a = new Array[Long](g + 2)
    a(g + 1) = 0
    a(g) = 1
    var l = g - 1
    while (l >= 0) { a(l) = a(l + 1) * 4 + 1; l -= 1 }
    a
  }

  /** Total number of codes (pre-order indices are in [0, total)). */
  def totalCodes: Long = subtree(0)

  /** Normalize lon/lat bbox to unit square. */
  private def norm(v: Double, min: Double, max: Double): Double = {
    val x = (v - min) / (max - min)
    if (x < 0) 0.0 else if (x > 1) 1.0 else x
  }

  /** Index a lon/lat bbox. */
  def index(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double): Long = {
    val nxmin = norm(lonMin, -180, 180); val nxmax = norm(lonMax, -180, 180)
    val nymin = norm(latMin, -90, 90);   val nymax = norm(latMax, -90, 90)
    val w = math.max(nxmax - nxmin, nymax - nymin)
    // deepest level whose cell width >= element max dim (so the 2x
    // enlarged cell anchored at the min corner's cell contains it) —
    // then try one level deeper (the XZ paper's "l1 or l1+1" rule,
    // section 4.1): the element often still fits the smaller cell's
    // enlarged extent, and the deeper anchor halves false positives
    val l1 = if (w <= 0) g else math.min(g, math.floor(-math.log(math.max(w, math.pow(0.5, g))) / math.log(2.0)).toInt)
    val l = if (l1 >= g) g else {
      val w2 = math.pow(0.5, l1 + 1)
      def fits(min: Double, max: Double): Boolean =
        max <= math.floor(min / w2) * w2 + 2 * w2
      if (fits(nxmin, nxmax) && fits(nymin, nymax)) l1 + 1 else l1
    }
    sequenceCode(nxmin, nymin, l)
  }

  /** Pre-order code of the level-l cell containing point (x, y) in [0,1]^2. */
  private def sequenceCode(x: Double, y: Double, l: Int): Long = {
    var code = 0L
    var xmin = 0.0; var xmax = 1.0
    var ymin = 0.0; var ymax = 1.0
    var i = 1
    while (i <= l) {
      val xc = (xmin + xmax) / 2
      val yc = (ymin + ymax) / 2
      val qx = if (x >= xc) 1 else 0
      val qy = if (y >= yc) 1 else 0
      val q = qx | (qy << 1)
      code += 1 + q * subtree(i)
      if (qx == 1) xmin = xc else xmax = xc
      if (qy == 1) ymin = yc else ymax = yc
      i += 1
    }
    code
  }

  /**
   * Range cover for a query window: BFS of the quadtree classifying each
   * cell by its enlarged extent vs the window (see paper Lemma 3; the
   * reference's equivalent is XZ2SFC.ranges). `contained=true` ranges
   * need no exact geometry re-check.
   */
  def ranges(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
             maxRanges: Int = 2048): Seq[IndexRange] = {
    val qxmin = norm(lonMin, -180, 180); val qxmax = norm(lonMax, -180, 180)
    val qymin = norm(latMin, -90, 90);   val qymax = norm(latMax, -90, 90)
    val out = scala.collection.mutable.ArrayBuffer.empty[IndexRange]

    // node: (code of this cell, level, cell bounds)
    final case class Node(code: Long, level: Int, xmin: Double, ymin: Double, width: Double)
    var frontier = List(Node(0L, 0, 0.0, 0.0, 1.0))
    var budget = maxRanges
    while (frontier.nonEmpty && budget > 0) {
      val next = scala.collection.mutable.ListBuffer.empty[Node]
      frontier.foreach { n =>
        // enlarged cell: doubled extent anchored at min corner
        val exmax = n.xmin + 2 * n.width
        val eymax = n.ymin + 2 * n.width
        // STRICT comparisons: an element that merely touches the window
        // boundary still intersects (JTS intersects counts touching, and
        // the reference's XZ2SFC.overlaps is inclusive) — `<=` here would
        // silently drop boundary rows from the cover
        val disjoint = exmax < qxmin || n.xmin > qxmax || eymax < qymin || n.ymin > qymax
        if (!disjoint) {
          val enlargedContained =
            n.xmin >= qxmin && exmax <= qxmax && n.ymin >= qymin && eymax <= qymax
          if (enlargedContained) {
            // every element in this subtree is inside the window
            out += IndexRange(n.code, n.code + subtree(n.level) - 1, contained = true)
          } else if (n.level >= g || out.length + next.length >= maxRanges) {
            // budget/depth exhausted: over-cover the whole subtree
            out += IndexRange(n.code, n.code + subtree(n.level) - 1, contained = false)
          } else {
            // elements anchored at this cell may intersect: emit the single code
            out += IndexRange(n.code, n.code, contained = false)
            val half = n.width / 2
            val childLvl = n.level + 1
            var q = 0
            while (q < 4) {
              val qx = q & 1
              val qy = (q >> 1) & 1
              next += Node(n.code + 1 + q * subtree(childLvl), childLvl,
                n.xmin + qx * half, n.ymin + qy * half, half)
              q += 1
            }
          }
        }
      }
      frontier = next.toList
      budget = maxRanges - out.length
    }
    // drain any remaining frontier as over-covering subtree ranges
    frontier.foreach { n =>
      out += IndexRange(n.code, n.code + subtree(n.level) - 1, contained = false)
    }
    ZRangeCover.merge(out.toSeq)
  }
}
