package graft.cells

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit

/**
 * Splits an epoch-millis timestamp into (bin, offset) where `bin` counts
 * whole periods since the Unix epoch and `offset` is the position inside
 * the period, in a per-period unit chosen so the offset fits the curve's
 * 21-bit time dimension comfortably:
 *
 *   Day   -> offset in milliseconds   (max 86,400,000)
 *   Week  -> offset in seconds        (max 604,800)
 *   Month -> offset in seconds        (max ~2.7M)
 *   Year  -> offset in minutes        (max ~527k)
 *
 * Semantics mirror the reference's time binning (see /root/reference/
 * geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/BinnedTime.scala:16-231)
 * so Z3 keys bin identically; implementation is ours on java.time.
 */
object BinnedTime {

  sealed abstract class Period(val name: String)
  case object Day extends Period("day")
  case object Week extends Period("week")
  case object Month extends Period("month")
  case object Year extends Period("year")

  def period(name: String): Period = name.toLowerCase match {
    case "day" => Day
    case "week" => Week
    case "month" => Month
    case "year" => Year
    case other => throw new IllegalArgumentException(s"unknown period: $other")
  }

  final case class Binned(bin: Short, offset: Long)

  private val Epoch = LocalDate.of(1970, 1, 1)

  /** Inclusive lower bound of binnable time: the epoch (the reference's
    * BinnedTime.ZMinDate, BinnedTime.scala:55-56). */
  val MinMillis: Long = 0L

  /** Exclusive upper bound of binnable time for a period — the bin index
    * is a Short, so Short.MaxValue + 1 whole periods past the epoch
    * (the reference's Days/Weeks/Months/YearsMaxDate, :58-62). Dates at
    * or past this cannot be Z3-indexed; the converter's z-index
    * validator rejects them. */
  def maxMillis(p: Period): Long = {
    val n = Short.MaxValue.toInt + 1
    val d = p match {
      case Day => Epoch.plusDays(n.toLong)
      case Week => Epoch.plusWeeks(n.toLong)
      case Month => Epoch.plusMonths(n.toLong)
      case Year => Epoch.plusYears(n.toLong)
    }
    d.atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli
  }

  /** Exclusive upper bound on offsets per period (used as the time
    * dimension's normalization max). Month uses the 31-day maximum. */
  def maxOffset(p: Period): Long = p match {
    case Day   => 86400000L                 // ms in a day
    case Week  => 7L * 86400                // s in a week
    case Month => 31L * 86400               // s in the longest month
    case Year  => 366L * 1440               // min in a leap year
  }

  def toBinned(p: Period, millis: Long): Binned = {
    val instant = Instant.ofEpochMilli(millis)
    val dt = LocalDateTime.ofInstant(instant, ZoneOffset.UTC)
    p match {
      case Day =>
        val days = ChronoUnit.DAYS.between(Epoch, dt.toLocalDate)
        val start = dt.toLocalDate.atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli
        Binned(days.toShort, millis - start)
      case Week =>
        val days = ChronoUnit.DAYS.between(Epoch, dt.toLocalDate)
        val weeks = Math.floorDiv(days, 7L)
        val weekStartDay = Epoch.plusDays(weeks * 7)
        val start = weekStartDay.atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli
        Binned(weeks.toShort, (millis - start) / 1000L)
      case Month =>
        val months = ChronoUnit.MONTHS.between(Epoch, dt.toLocalDate.withDayOfMonth(1))
        val start = dt.toLocalDate.withDayOfMonth(1).atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli
        Binned(months.toShort, (millis - start) / 1000L)
      case Year =>
        val years = dt.getYear - 1970
        val start = LocalDate.of(dt.getYear, 1, 1).atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli
        Binned(years.toShort, (millis - start) / 60000L)
    }
  }

  /** Millis at the start of bin `bin`. */
  def binStartMillis(p: Period, bin: Short): Long = p match {
    case Day   => bin.toLong * 86400000L
    case Week  => bin.toLong * 7 * 86400000L
    case Month => Epoch.plusMonths(bin.toLong).atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli
    case Year  => LocalDate.of(1970 + bin, 1, 1).atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli
  }

  /** Inverse of toBinned (to offset-unit precision). */
  def fromBinned(p: Period, b: Binned): Long = {
    val unit = p match {
      case Day => 1L
      case Week | Month => 1000L
      case Year => 60000L
    }
    binStartMillis(p, b.bin) + b.offset * unit
  }

  /** All (bin, offsetLo, offsetHi) triples covering [startMillis, endMillis]
    * (inclusive). Middle bins span the whole period. */
  def binnedRanges(p: Period, startMillis: Long, endMillis: Long): Seq[(Short, Long, Long)] = {
    require(startMillis <= endMillis, "start after end")
    val sb = toBinned(p, startMillis)
    val eb = toBinned(p, endMillis)
    if (sb.bin == eb.bin) Seq((sb.bin, sb.offset, eb.offset))
    else {
      val maxOff = maxOffset(p) - 1
      val head = (sb.bin, sb.offset, maxOff)
      val tail = (eb.bin, 0L, eb.offset)
      val middle = ((sb.bin + 1) until eb.bin).map(b => (b.toShort, 0L, maxOff))
      head +: middle :+ tail
    }
  }
}
