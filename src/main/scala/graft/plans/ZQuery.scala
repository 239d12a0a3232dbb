package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.cells._

/**
 * Query planning over Z-indexed columns: turns a (bbox, time interval)
 * predicate into range predicates on (bin, z) / cell columns — the
 * Catalyst-side analog of the reference's key-space planners
 * (Z3IndexKeySpace.getRanges, geomesa-index-api/.../index/z3/
 * Z3IndexKeySpace.scala:123-136) and its scan-range cap
 * (`geomesa.scan.ranges.target`). The produced Column is a plain
 * boolean expression, so it pushes into Parquet scans (min/max row-group
 * skipping on the z column) and prunes partitions when the bin/cell
 * prefix is a partition column.
 */
object ZQuery {

  /** z-range predicates for a bbox over a 31-bit Z2 point column. */
  def z2Ranges(bbox: (Double, Double, Double, Double), maxRanges: Int = 64): Seq[IndexRange] = {
    val (xmin, ymin, xmax, ymax) = bbox
    val nx = NormalizedDimension.lon(Z2.BitsPerDim)
    val ny = NormalizedDimension.lat(Z2.BitsPerDim)
    ZRangeCover.z2Ranges(
      nx.normalize(xmin), ny.normalize(ymin), nx.normalize(xmax), ny.normalize(ymax),
      maxRanges = maxRanges)
  }

  /** Filter column for a Z2-indexed point column. `exact=false` means the
    * cover over-approximates (caller must refine with the true predicate). */
  def z2Filter(zCol: Column, bbox: (Double, Double, Double, Double), maxRanges: Int = 64): Column =
    rangesToColumn(zCol, z2Ranges(bbox, maxRanges))

  /** Per-bin z3 ranges for bbox x [startMillis, endMillis]. Mirrors the
    * reference's per-bin interval handling incl. whole-period middle bins
    * (Z3IndexKeySpace.scala:65-121). */
  def z3Ranges(bbox: (Double, Double, Double, Double),
               startMillis: Long, endMillis: Long,
               period: BinnedTime.Period,
               maxRangesPerBin: Int = 32): Seq[(Short, Seq[IndexRange])] = {
    val (xmin, ymin, xmax, ymax) = bbox
    val nx = NormalizedDimension.lon(Z3.BitsPerDim)
    val ny = NormalizedDimension.lat(Z3.BitsPerDim)
    val nt = NormalizedDimension.time(Z3.BitsPerDim, BinnedTime.maxOffset(period))
    BinnedTime.binnedRanges(period, startMillis, endMillis).map { case (bin, lo, hi) =>
      bin -> ZRangeCover.z3Ranges(
        nx.normalize(xmin), ny.normalize(ymin), nt.normalize(lo.toDouble),
        nx.normalize(xmax), ny.normalize(ymax), nt.normalize(hi.toDouble),
        maxRanges = maxRangesPerBin)
    }
  }

  /** Boolean filter over (binCol, zCol) for a spatio-temporal box query. */
  def z3Filter(binCol: Column, zCol: Column,
               bbox: (Double, Double, Double, Double),
               startMillis: Long, endMillis: Long,
               period: BinnedTime.Period,
               maxRangesPerBin: Int = 32): Column = {
    z3Ranges(bbox, startMillis, endMillis, period, maxRangesPerBin)
      .map { case (bin, ranges) => binCol === lit(bin.toInt) && rangesToColumn(zCol, ranges) }
      .reduce(_ || _)
  }

  private def rangesToColumn(zCol: Column, ranges: Seq[IndexRange]): Column =
    ranges.map(r => zCol.between(lit(r.lower), lit(r.upper))).reduce(_ || _)

  /**
   * Function-form z3 check: one evaluation of (binCol, zCol) per row with
   * a binary search over the captured ranges. Use this when bin/z are
   * COMPUTED columns — the OR-of-BETWEENs form (z3Filter) duplicates the
   * computing expression into every term after CollapseProject, turning
   * one UDF call per row into one per range. For STORED columns prefer
   * z3Filter: plain attribute references are free and the BETWEENs push
   * into Parquet row-group skipping.
   */
  def z3FilterFn(binCol: Column, zCol: Column,
                 bbox: (Double, Double, Double, Double),
                 startMillis: Long, endMillis: Long,
                 period: BinnedTime.Period,
                 maxRangesPerBin: Int = 32): Column = {
    val byBin: Map[Int, (Array[Long], Array[Long])] =
      z3Ranges(bbox, startMillis, endMillis, period, maxRangesPerBin).map { case (bin, rs) =>
        val sorted = rs.sortBy(_.lower)
        bin.toInt -> (sorted.map(_.lower).toArray, sorted.map(_.upper).toArray)
      }.toMap
    val check = udf { (bin: Int, z: Long) =>
      byBin.get(bin) match {
        case None => false
        case Some((lo, hi)) =>
          var i = java.util.Arrays.binarySearch(lo, z)
          if (i >= 0) true
          else {
            i = -i - 2 // last range starting <= z
            i >= 0 && z <= hi(i)
          }
      }
    }
    check(binCol, zCol)
  }

  /** Function-form z2 check: one evaluation of zCol per row with a
    * binary search over the ranges — for COMPUTED z columns, where the
    * OR-of-BETWEENs form would re-run the computing expression once per
    * range term (see z3FilterFn). For stored columns prefer z2Filter. */
  def z2FilterFn(zCol: Column, bbox: (Double, Double, Double, Double),
                 maxRanges: Int = 64): Column = {
    val sorted = z2Ranges(bbox, maxRanges).sortBy(_.lower)
    val lo = sorted.map(_.lower).toArray
    val hi = sorted.map(_.upper).toArray
    val check = udf { (z: Long) =>
      var i = java.util.Arrays.binarySearch(lo, z)
      if (i >= 0) true
      else {
        i = -i - 2 // last range starting <= z
        i >= 0 && z <= hi(i)
      }
    }
    check(zCol)
  }

  /** Cell-id range predicates at resolution `res` for a bbox — used for
    * partition pruning on cell-partitioned tables: contiguous runs of
    * Morton codes inside the bbox become BETWEENs on the cell column. */
  def cellRanges(bbox: (Double, Double, Double, Double), res: Int,
                 maxRanges: Int = 64): Seq[IndexRange] = {
    val (xmin, ymin, xmax, ymax) = bbox
    val n = 1L << res
    def clamp(i: Long) = math.max(0L, math.min(n - 1, i))
    val x0 = clamp(math.floor((xmin + 180.0) / 360.0 * n).toLong)
    val x1 = clamp(math.floor((xmax + 180.0) / 360.0 * n).toLong)
    val y0 = clamp(math.floor((ymin + 90.0) / 180.0 * n).toLong)
    val y1 = clamp(math.floor((ymax + 90.0) / 180.0 * n).toLong)
    val base = res.toLong << 58
    ZRangeCover.z2Ranges(x0.toInt, y0.toInt, x1.toInt, y1.toInt,
        bitsPerDim = res, maxRanges = maxRanges)
      .map(r => IndexRange(base | r.lower, base | r.upper, r.contained))
  }

  def cellFilter(cellCol: Column, bbox: (Double, Double, Double, Double), res: Int,
                 maxRanges: Int = 64): Column =
    rangesToColumn(cellCol, cellRanges(bbox, res, maxRanges))
}
