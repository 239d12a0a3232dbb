package graft.cells

/**
 * Space-filling-curve kernels, written from scratch on the published
 * Morton/Z-order construction (Tropf & Herzog 1981) and the XZ-ordering
 * paper (Boehm, Klump, Kriegel 1999). Semantics mirror the reference
 * engine's curve layer (see /root/reference/geomesa-z3/src/main/scala/org/
 * locationtech/geomesa/curve/Z2SFC.scala:15-54, Z3SFC.scala:22-78,
 * NormalizedDimension.scala:14-98) without any code reuse: bit widths,
 * dimension bounds and rounding rules match so index keys and range covers
 * are comparable; the implementation is our own.
 *
 * All kernels are pure JVM (no Spark imports) so they can run inside
 * Catalyst expressions, executors, and plain unit tests alike.
 */

/** Maps a double in [min, max] onto an integer lattice [0, 2^precision). */
final case class NormalizedDimension(min: Double, max: Double, precision: Int) {
  require(precision > 0 && precision < 32, s"precision $precision out of (0,32)")
  val bins: Long = 1L << precision
  val maxIndex: Int = (bins - 1).toInt
  private val scale = bins / (max - min)
  private val inverse = (max - min) / bins

  /** Clamped floor-normalization: every double in range maps to a bin. */
  def normalize(x: Double): Int = {
    if (x <= min) 0
    else if (x >= max) maxIndex
    else {
      val i = ((x - min) * scale).toLong
      if (i > maxIndex) maxIndex else i.toInt
    }
  }

  /** Bin midpoint (round-trip error <= half bin width). */
  def denormalize(i: Int): Double = min + (i + 0.5) * inverse

  /** Lower edge of bin i. */
  def lo(i: Int): Double = min + i * inverse
  /** Upper edge of bin i. */
  def hi(i: Int): Double = min + (i + 1) * inverse
}

object NormalizedDimension {
  def lon(precision: Int): NormalizedDimension = NormalizedDimension(-180.0, 180.0, precision)
  def lat(precision: Int): NormalizedDimension = NormalizedDimension(-90.0, 90.0, precision)
  def time(precision: Int, maxOffset: Long): NormalizedDimension =
    NormalizedDimension(0.0, maxOffset.toDouble, precision)
}

/** 2-D Morton interleave at 31 bits per dimension (62-bit keys). */
object Z2 {
  val BitsPerDim = 31
  val MaxMask: Long = (1L << BitsPerDim) - 1

  /** Spread the low 31 bits of x so they occupy even bit positions. */
  def split(x: Long): Long = {
    var v = x & MaxMask
    v = (v | v << 32) & 0x00000000ffffffffL
    v = (v | v << 16) & 0x0000ffff0000ffffL
    v = (v | v << 8)  & 0x00ff00ff00ff00ffL
    v = (v | v << 4)  & 0x0f0f0f0f0f0f0f0fL
    v = (v | v << 2)  & 0x3333333333333333L
    v = (v | v << 1)  & 0x5555555555555555L
    v
  }

  /** Inverse of split: gather even bit positions into the low 31 bits. */
  def combine(z: Long): Long = {
    var v = z & 0x5555555555555555L
    v = (v ^ (v >>> 1))  & 0x3333333333333333L
    v = (v ^ (v >>> 2))  & 0x0f0f0f0f0f0f0f0fL
    v = (v ^ (v >>> 4))  & 0x00ff00ff00ff00ffL
    v = (v ^ (v >>> 8))  & 0x0000ffff0000ffffL
    v = (v ^ (v >>> 16)) & 0x00000000ffffffffL
    v
  }

  def index(ix: Long, iy: Long): Long = split(ix) | (split(iy) << 1)
  def invertX(z: Long): Long = combine(z)
  def invertY(z: Long): Long = combine(z >>> 1)
}

/** 3-D Morton interleave at 21 bits per dimension (63-bit keys). */
object Z3 {
  val BitsPerDim = 21
  val MaxMask: Long = (1L << BitsPerDim) - 1

  def split(x: Long): Long = {
    var v = x & MaxMask
    v = (v | v << 32) & 0x1f00000000ffffL
    v = (v | v << 16) & 0x1f0000ff0000ffL
    v = (v | v << 8)  & 0x100f00f00f00f00fL
    v = (v | v << 4)  & 0x10c30c30c30c30c3L
    v = (v | v << 2)  & 0x1249249249249249L
    v
  }

  def combine(z: Long): Long = {
    var v = z & 0x1249249249249249L
    v = (v ^ (v >>> 2))  & 0x10c30c30c30c30c3L
    v = (v ^ (v >>> 4))  & 0x100f00f00f00f00fL
    v = (v ^ (v >>> 8))  & 0x1f0000ff0000ffL
    v = (v ^ (v >>> 16)) & 0x1f00000000ffffL
    v = (v ^ (v >>> 32)) & MaxMask
    v
  }

  def index(ix: Long, iy: Long, it: Long): Long =
    split(ix) | (split(iy) << 1) | (split(it) << 2)
  def invertX(z: Long): Long = combine(z)
  def invertY(z: Long): Long = combine(z >>> 1)
  def invertT(z: Long): Long = combine(z >>> 2)
}

/** An inclusive range [lower, upper] of curve values. `contained` = every
  * point of the range satisfies the query (no post-filter needed). */
final case class IndexRange(lower: Long, upper: Long, contained: Boolean)

/**
 * Generic Morton range cover by prefix (quadtree / octree) descent.
 *
 * Decomposes an axis-aligned query window into z-value ranges: walk the
 * prefix tree; a node fully inside the window emits a `contained` range,
 * a node overlapping emits recursion (or an over-covering range once the
 * budget `maxRanges` or max depth is hit). Adjacent output ranges merge.
 * This reproduces the semantics of the reference's range planner
 * (Z2SFC.ranges / Z3SFC.ranges) via the published BIGMIN-free quadtree
 * method.
 */
object ZRangeCover {

  /** 2-D cover: queries given in normalized grid coords (inclusive). */
  def z2Ranges(xmin: Int, ymin: Int, xmax: Int, ymax: Int,
               bitsPerDim: Int = Z2.BitsPerDim,
               maxRanges: Int = 2048,
               maxLevels: Int = 32): Seq[IndexRange] = {
    cover(Array(xmin.toLong, ymin.toLong), Array(xmax.toLong, ymax.toLong),
      dims = 2, bitsPerDim = bitsPerDim, maxRanges = maxRanges, maxLevels = maxLevels,
      interleave = a => Z2.index(a(0), a(1)))
  }

  /** 3-D cover in normalized grid coords (inclusive). */
  def z3Ranges(xmin: Int, ymin: Int, tmin: Long, xmax: Int, ymax: Int, tmax: Long,
               bitsPerDim: Int = Z3.BitsPerDim,
               maxRanges: Int = 2048,
               maxLevels: Int = 32): Seq[IndexRange] = {
    cover(Array(xmin.toLong, ymin.toLong, tmin), Array(xmax.toLong, ymax.toLong, tmax),
      dims = 3, bitsPerDim = bitsPerDim, maxRanges = maxRanges, maxLevels = maxLevels,
      interleave = a => Z3.index(a(0), a(1), a(2)))
  }

  private def cover(qlo: Array[Long], qhi: Array[Long], dims: Int, bitsPerDim: Int,
                    maxRanges: Int, maxLevels: Int,
                    interleave: Array[Long] => Long): Seq[IndexRange] = {
    // BFS over the prefix tree so the whole boundary refines at ONE
    // uniform granularity and the budget is a real bound: descent stops
    // as soon as the next level could exceed `maxRanges`, so the output
    // never exceeds it (pre-merge). A DFS with a late cap spends the
    // entire budget on fine detail near the first corner and then
    // over-emits one range per pending node — covers came out 10-20x
    // over budget, and an OR-of-BETWEENs predicate built from them
    // re-evaluated its (possibly computed) column once per term.
    val nChildren = 1 << dims
    val out = scala.collection.mutable.ArrayBuffer.empty[IndexRange]
    // node = cell at `level` with per-dim prefix coords; cell spans
    // [prefix << shift, (prefix+1) << shift) per dim where shift = bitsPerDim - level
    def emit(prefix: Array[Long], level: Int, contained: Boolean): Unit = {
      val shift = bitsPerDim - level
      val lo = prefix.map(_ << shift)
      // z of cell max corner: all low bits set within the cell
      val hi = prefix.map(p => ((p + 1) << shift) - 1)
      out += IndexRange(interleave(lo), interleave(hi), contained)
    }
    // 1 = fully inside the window, -1 = disjoint, 0 = boundary
    def classify(prefix: Array[Long], level: Int): Int = {
      val shift = bitsPerDim - level
      var inside = true
      var d = 0
      while (d < dims) {
        val lo = prefix(d) << shift
        val hi = ((prefix(d) + 1) << shift) - 1
        if (hi < qlo(d) || lo > qhi(d)) return -1
        if (lo < qlo(d) || hi > qhi(d)) inside = false
        d += 1
      }
      if (inside) 1 else 0
    }
    var frontier = scala.collection.mutable.ArrayBuffer(new Array[Long](dims))
    var level = 0
    classify(frontier.head, 0) match {
      case 1 => emit(frontier.head, 0, contained = true); frontier.clear()
      case -1 => frontier.clear()
      case _ =>
    }
    while (frontier.nonEmpty) {
      if (level >= bitsPerDim || level >= maxLevels ||
          out.length + frontier.length * nChildren > maxRanges) {
        // budget or depth reached: emit the remaining boundary as-is
        frontier.foreach(p => emit(p, level, contained = false))
        frontier.clear()
      } else {
        val next = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        frontier.foreach { p =>
          var child = 0
          while (child < nChildren) {
            val cp = new Array[Long](dims)
            var i = 0
            while (i < dims) {
              cp(i) = (p(i) << 1) | ((child >> i) & 1)
              i += 1
            }
            classify(cp, level + 1) match {
              case 1 => emit(cp, level + 1, contained = true)
              case 0 => next += cp
              case _ =>
            }
            child += 1
          }
        }
        frontier = next
        level += 1
      }
    }
    merge(out.toSeq)
  }

  def merge(ranges: Seq[IndexRange]): Seq[IndexRange] = {
    if (ranges.isEmpty) return ranges
    val sorted = ranges.sortBy(_.lower)
    val out = scala.collection.mutable.ArrayBuffer.empty[IndexRange]
    var cur = sorted.head
    sorted.tail.foreach { r =>
      if (r.lower <= cur.upper + 1 && r.contained == cur.contained) {
        cur = IndexRange(cur.lower, math.max(cur.upper, r.upper), cur.contained)
      } else {
        out += cur
        cur = r
      }
    }
    out += cur
    out.toSeq
  }
}
