package graft.operators

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cells.{NormalizedDimension, Z2}
import graft.geom.GeomOps

/**
 * Typed value binning — the semantics of the reference's BinnedArray
 * family (geomesa-utils/.../stats/BinnedArray.scala:29-363; fixtures
 * BinnedArrayTest.scala:20-276), which backs its range Histogram stat
 * for every attribute type: whole numbers (int/long/date) get exact
 * integral bin edges, float/double get continuous edges, strings are
 * binned by base-36 value after longest-common-prefix normalization,
 * and geometries by the Z2 Morton value of their centroid.
 *
 * The binners are pure JVM value classes (no Spark imports in the
 * kernel) so the same arithmetic runs in unit tests, in scalar UDFs,
 * and — for the long-backed family — as plain Column arithmetic that
 * stays inside whole-stage codegen: `Binned.longBinCol` builds the
 * floor-divide/clamp expression directly, so a 100-TB date histogram
 * is a map-side-combined groupBy on a codegen'd integer, not a boxed
 * UDF call per row.
 */
object Binned {

  /** Whole-number binning (reference WholeNumberBinnedArray:130-186):
    * exact integral edges via ceil/floor, upper bound clamps into the
    * last bin, out-of-range maps to -1. Backs int/long/date/string/
    * geometry binning through each type's injective map to Long. */
  final case class LongBins(length: Int, min: Long, max: Long) {
    require(length > 0, s"need at least one bin (got $length)")
    require(min < max, s"upper bound must be greater than lower bound: lower=$min upper=$max")

    val binSize: Double = (max - min).toDouble / length

    def indexOf(value: Long): Int = {
      if (value < min || value > max) -1
      else {
        val i = math.floor((value - min) / binSize).toInt
        if (i < 0 || i > length) -1 else if (i == length) length - 1 else i
      }
    }

    /** Midpoint value of bin i, clamped to the upper bound. */
    def medianValue(index: Int): Long = {
      if (index < 0 || index > length) throw new ArrayIndexOutOfBoundsException(index)
      val long = min + math.round(binSize / 2 + binSize * index)
      if (long > max) max else long
    }

    /** Inclusive value range of bin i; edges never out of order. */
    def boundsOf(index: Int): (Long, Long) = {
      if (index < 0 || index > length) throw new ArrayIndexOutOfBoundsException(index)
      val lo = min + math.ceil(binSize * index).toLong
      val hi = math.max(lo, min + math.floor(binSize * (index + 1)).toLong)
      (if (lo <= min) min else lo, if (hi >= max) max else hi)
    }

    def isBelow(value: Long): Boolean = value < min
  }

  /** Continuous binning for float/double (reference BinnedDoubleArray /
    * BinnedFloatArray:230-296): edges at lo + i*binSize, median at the
    * bin midpoint, upper bound clamps into the last bin. */
  final case class DoubleBins(length: Int, min: Double, max: Double) {
    require(length > 0, s"need at least one bin (got $length)")
    require(min < max, s"upper bound must be greater than lower bound: lower=$min upper=$max")

    val binSize: Double = (max - min) / length

    def indexOf(value: Double): Int = {
      // NaN compares false to everything — without the explicit check it
      // would fall through to floor(NaN)=0 and pollute the first bin
      // (the Column form already drops NaN as out-of-range)
      if (value.isNaN || value < min || value > max) -1
      else {
        val i = math.floor((value - min) / binSize).toInt
        if (i < 0 || i > length) -1 else if (i == length) length - 1 else i
      }
    }

    def medianValue(index: Int): Double = {
      if (index < 0 || index > length) throw new ArrayIndexOutOfBoundsException(index)
      min + binSize / 2 + binSize * index
    }

    def boundsOf(index: Int): (Double, Double) = {
      if (index < 0 || index > length) throw new ArrayIndexOutOfBoundsException(index)
      (min + binSize * index, min + binSize * (index + 1))
    }

    def isBelow(value: Double): Boolean = value < min
  }

  /** Base-36 string arithmetic (reference BinnedStringArray:303-363):
    * lowercase, non-alphanumerics collapse to '0', bounds padded /
    * sorted / de-duplicated, and values map to the base-36 long of the
    * 12 significant digits after the bounds' common prefix. */
  object Base36 {
    val Lowest: Char = '0'
    val Highest: Char = 'z'

    def normalize(s: String): String =
      s.toLowerCase(Locale.US).replaceAll("[^0-9a-z]", Lowest.toString)

    /** Pad to a common length, order, and force distinct (longer of the
      * two lengths; ties broken by appending a lowest/highest digit). */
    def normalizeBounds(rawLo: String, rawHi: String): (String, String) = {
      val length = math.max(rawLo.length, rawHi.length)
      val lo36 = normalize(rawLo)
      val hi36 = normalize(rawHi)
      val (loPad, hiPad) =
        if (lo36 < hi36) (lo36.padTo(length, Lowest), hi36.padTo(length, Highest))
        else (hi36.padTo(length, Lowest), lo36.padTo(length, Highest))
      val (loDis, hiDis) =
        if (loPad == hiPad) (loPad + Lowest, hiPad + Highest) else (loPad, hiPad)
      // 12 base-36 digits is the most that fits in a positive Long
      val prefixLength = loDis.zip(hiDis).indexWhere { case (l, r) => l != r }
      val loFit = if (loDis.length > prefixLength + 12) loDis.take(prefixLength + 12) else loDis
      val hiFit = if (hiDis.length > prefixLength + 12) hiDis.take(prefixLength + 12) else hiDis
      if (loFit == hiFit) (loFit.dropRight(1) + Lowest, hiFit.dropRight(1) + Highest)
      else (loFit, hiFit)
    }
  }

  /** String binning over normalized base-36 bounds. */
  final case class StringBins(length: Int, rawLo: String, rawHi: String) {
    val (start, end): (String, String) = Base36.normalizeBounds(rawLo, rawHi)
    private val normalizedLength = start.length
    private val prefixLength = start.zip(end).indexWhere { case (l, r) => l != r }
    private val prefix = start.substring(0, prefixLength)

    def toLong(value: String): Long = {
      val normalized = Base36.normalize(value).padTo(normalizedLength, Base36.Lowest)
      if (normalized < start) 0L
      else if (normalized > end) Long.MaxValue
      else {
        val sig = normalized.substring(prefixLength).padTo(12, Base36.Lowest).substring(0, 12)
        java.lang.Long.parseLong(sig, 36)
      }
    }

    def fromLong(value: Long): String =
      prefix + java.lang.Long.toString(value, 36).reverse.padTo(12, Base36.Lowest)
        .reverse.replaceFirst("0+$", "")

    val bins: LongBins = LongBins(length, toLong(start), toLong(end))

    def indexOf(value: String): Int = bins.indexOf(toLong(value))
    def medianValue(index: Int): String = fromLong(bins.medianValue(index))
    def boundsOf(index: Int): (String, String) = {
      val (lo, hi) = bins.boundsOf(index)
      (fromLong(lo), fromLong(hi))
    }
  }

  /** Geometry binning by the Z2 Morton value of the centroid (reference
    * BinnedGeometryArray:210-228) — bins follow the space-filling curve
    * between the two corner geometries. */
  final case class GeometryBins(length: Int, loWkb: Array[Byte], hiWkb: Array[Byte]) {
    private val lon = NormalizedDimension.lon(31)
    private val lat = NormalizedDimension.lat(31)

    def toLong(wkb: Array[Byte]): Long = {
      val g = GeomOps.fromWkb(wkb)
      val c = g match {
        case p: org.locationtech.jts.geom.Point => p.getCoordinate
        case other =>
          val cent = other.getCentroid
          // safeCentroid analog: empty/degenerate centroid falls back to
          // the envelope center so dirty geometries are data, not errors
          if (cent.isEmpty) {
            val e = other.getEnvelopeInternal
            new org.locationtech.jts.geom.Coordinate(
              (e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2)
          } else cent.getCoordinate
      }
      Z2.index(lon.normalize(c.x).toLong, lat.normalize(c.y).toLong)
    }

    def fromLong(z: Long): Array[Byte] = {
      val x = lon.denormalize(Z2.invertX(z).toInt)
      val y = lat.denormalize(Z2.invertY(z).toInt)
      GeomOps.toWkb(GeomOps.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x, y)))
    }

    val bins: LongBins = LongBins(length, toLong(loWkb), toLong(hiWkb))

    def indexOf(wkb: Array[Byte]): Int = bins.indexOf(toLong(wkb))
    def medianValue(index: Int): Array[Byte] = fromLong(bins.medianValue(index))
    def boundsOf(index: Int): (Array[Byte], Array[Byte]) = {
      val (lo, hi) = bins.boundsOf(index)
      (fromLong(lo), fromLong(hi))
    }
  }

  // ---- Column forms ------------------------------------------------------

  /** Whole-number bin index as pure Column arithmetic (codegen, no UDF):
    * NULL when out of range, floor-divide otherwise, upper bound clamped
    * into the last bin — exactly LongBins.indexOf. The long column can be
    * an int, long, or `unix_millis(ts)` for dates. */
  def longBinCol(v: Column, length: Int, min: Long, max: Long): Column = {
    val binSize = (max - min).toDouble / length
    val raw = floor((v - lit(min)) / lit(binSize)).cast("int")
    when(v < lit(min) || v > lit(max), lit(null))
      .otherwise(least(raw, lit(length - 1)))
  }

  /** Continuous bin index for float/double columns (DoubleBins.indexOf). */
  def doubleBinCol(v: Column, length: Int, min: Double, max: Double): Column = {
    val binSize = (max - min) / length
    val raw = floor((v - lit(min)) / lit(binSize)).cast("int")
    when(v < lit(min) || v > lit(max), lit(null))
      .otherwise(least(raw, lit(length - 1)))
  }

  /** Base-36 string bin index (scalar UDF — string normalization is not
    * expressible as built-in Columns; still a per-row map, no shuffle). */
  def stringBinCol(v: Column, length: Int, rawLo: String, rawHi: String): Column = {
    val b = StringBins(length, rawLo, rawHi)
    val f = udf { (s: String) =>
      if (s == null) None else { val i = b.indexOf(s); if (i < 0) None else Some(i) }
    }
    f(v)
  }

  /** Z2-centroid geometry bin index over WKB. */
  def geometryBinCol(v: Column, length: Int, loWkt: String, hiWkt: String): Column = {
    val b = GeometryBins(length,
      GeomOps.toWkb(GeomOps.fromWkt(loWkt)), GeomOps.toWkb(GeomOps.fromWkt(hiWkt)))
    val f = udf { (wkb: Array[Byte]) =>
      if (wkb == null) None else { val i = b.indexOf(wkb); if (i < 0) None else Some(i) }
    }
    f(v)
  }

  /** Date histogram over a timestamp column: reference Histogram-over-
    * BinnedDateArray as one codegen'd groupBy. Returns one row per
    * occupied bin with the reference's median value and inclusive
    * bounds. Out-of-range rows are dropped (indexOf == -1). */
  def dateHistogram(df: DataFrame, c: String, loMillis: Long, hiMillis: Long,
                    bins: Int): DataFrame = {
    val b = LongBins(bins, loMillis, hiMillis)
    val medians = typedLit(b.indices.map(b.medianValue))
    val los = typedLit(b.indices.map(i => b.boundsOf(i)._1))
    val his = typedLit(b.indices.map(i => b.boundsOf(i)._2))
    df.select(longBinCol(unix_millis(col(c).cast("timestamp")), bins, loMillis, hiMillis)
        .as("bin"))
      .where(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("count"))
      .withColumn("median_millis", element_at(medians, col("bin") + 1))
      .withColumn("lo_millis", element_at(los, col("bin") + 1))
      .withColumn("hi_millis", element_at(his, col("bin") + 1))
      .orderBy("bin")
  }

  implicit private class RichLongBins(val b: LongBins) {
    def indices: Seq[Int] = 0 until b.length
  }
}
