package graft.cells

/**
 * XZ-ordering in three dimensions (x, y, time) for spatio-temporal
 * extents — the octree generalization of XZ2, mirroring the reference's
 * xz3 index (/root/reference/geomesa-z3/.../curve/XZ3SFC.scala:26-464;
 * independent implementation from the XZ-ordering paper's construction).
 * Time is normalized into [0,1] per BinnedTime period, so keys are
 * (bin: Short, xz3: Long) like the reference's.
 */
final case class XZ3(g: Int, period: BinnedTime.Period) {
  require(g > 0 && g <= 18, s"max resolution $g out of (0,18]")

  private val maxOffset = BinnedTime.maxOffset(period).toDouble

  // subtree(l) = nodes in a full octree subtree rooted at level l
  private val subtree: Array[Long] = {
    val a = new Array[Long](g + 2)
    a(g + 1) = 0
    a(g) = 1
    var l = g - 1
    while (l >= 0) { a(l) = a(l + 1) * 8 + 1; l -= 1 }
    a
  }

  private def norm(v: Double, min: Double, max: Double): Double = {
    val x = (v - min) / (max - min)
    if (x < 0) 0.0 else if (x > 1) 1.0 else x
  }

  /** Index a lon/lat bbox x [offsetLo, offsetHi] (offsets within the
    * period bin, in the period's unit). */
  def index(lonMin: Double, latMin: Double, offLo: Long,
            lonMax: Double, latMax: Double, offHi: Long): Long = {
    val nx0 = norm(lonMin, -180, 180); val nx1 = norm(lonMax, -180, 180)
    val ny0 = norm(latMin, -90, 90);   val ny1 = norm(latMax, -90, 90)
    val nt0 = norm(offLo.toDouble, 0, maxOffset); val nt1 = norm(offHi.toDouble, 0, maxOffset)
    val w = math.max(math.max(nx1 - nx0, ny1 - ny0), nt1 - nt0)
    // "l1 or l1+1" anchor-level rule like XZ2.index (and the reference's
    // XZ3SFC): prefer the deeper level when the element still fits its
    // enlarged cell there
    val l1 =
      if (w <= 0) g
      else math.min(g, math.floor(-math.log(math.max(w, math.pow(0.5, g))) / math.log(2.0)).toInt)
    val l = if (l1 >= g) g else {
      val w2 = math.pow(0.5, l1 + 1)
      def fits(min: Double, max: Double): Boolean =
        max <= math.floor(min / w2) * w2 + 2 * w2
      if (fits(nx0, nx1) && fits(ny0, ny1) && fits(nt0, nt1)) l1 + 1 else l1
    }
    sequenceCode(nx0, ny0, nt0, l)
  }

  private def sequenceCode(x: Double, y: Double, t: Double, l: Int): Long = {
    var code = 0L
    var xmin = 0.0; var xmax = 1.0
    var ymin = 0.0; var ymax = 1.0
    var tmin = 0.0; var tmax = 1.0
    var i = 1
    while (i <= l) {
      val xc = (xmin + xmax) / 2; val yc = (ymin + ymax) / 2; val tc = (tmin + tmax) / 2
      val qx = if (x >= xc) 1 else 0
      val qy = if (y >= yc) 1 else 0
      val qt = if (t >= tc) 1 else 0
      val q = qx | (qy << 1) | (qt << 2)
      code += 1 + q * subtree(i)
      if (qx == 1) xmin = xc else xmax = xc
      if (qy == 1) ymin = yc else ymax = yc
      if (qt == 1) tmin = tc else tmax = tc
      i += 1
    }
    code
  }

  /** Range cover for window bbox x [offsetLo, offsetHi] in this bin. */
  def ranges(lonMin: Double, latMin: Double, offLo: Long,
             lonMax: Double, latMax: Double, offHi: Long,
             maxRanges: Int = 512): Seq[IndexRange] = {
    val qx0 = norm(lonMin, -180, 180); val qx1 = norm(lonMax, -180, 180)
    val qy0 = norm(latMin, -90, 90);   val qy1 = norm(latMax, -90, 90)
    val qt0 = norm(offLo.toDouble, 0, maxOffset); val qt1 = norm(offHi.toDouble, 0, maxOffset)
    val out = scala.collection.mutable.ArrayBuffer.empty[IndexRange]

    final case class Node(code: Long, level: Int, x: Double, y: Double, t: Double, w: Double)
    var frontier = List(Node(0L, 0, 0.0, 0.0, 0.0, 1.0))
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer.empty[Node]
      frontier.foreach { n =>
        val ex = n.x + 2 * n.w; val ey = n.y + 2 * n.w; val et = n.t + 2 * n.w
        // STRICT comparisons — boundary-touching elements intersect (see
        // XZ2.ranges; the day-period ZInterval fixture plants a point at
        // exactly the interval's inclusive upper offset)
        val disjoint = ex < qx0 || n.x > qx1 || ey < qy0 || n.y > qy1 || et < qt0 || n.t > qt1
        if (!disjoint) {
          val contained = n.x >= qx0 && ex <= qx1 && n.y >= qy0 && ey <= qy1 && n.t >= qt0 && et <= qt1
          if (contained) {
            out += IndexRange(n.code, n.code + subtree(n.level) - 1, contained = true)
          } else if (n.level >= g || out.length + next.length >= maxRanges) {
            out += IndexRange(n.code, n.code + subtree(n.level) - 1, contained = false)
          } else {
            out += IndexRange(n.code, n.code, contained = false)
            val half = n.w / 2
            val cl = n.level + 1
            var q = 0
            while (q < 8) {
              next += Node(n.code + 1 + q * subtree(cl), cl,
                n.x + (q & 1) * half, n.y + ((q >> 1) & 1) * half, n.t + ((q >> 2) & 1) * half, half)
              q += 1
            }
          }
        }
      }
      frontier = next.toList
    }
    ZRangeCover.merge(out.toSeq)
  }
}
