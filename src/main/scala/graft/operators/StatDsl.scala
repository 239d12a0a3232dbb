package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/**
 * The reference's composable Stat string grammar
 * (geomesa-utils/.../stats/StatParser.scala:66-160, Stat.scala:29-118):
 *
 *   "MinMax(a);Count();Enumeration(b)"            — SeqStat
 *   "GroupBy(key,MinMax(a);Count())"              — grouped stats
 *   Count() | MinMax(a) | Enumeration(a) | TopK(a) |
 *   DescriptiveStats(a,b,..) | Histogram(a,bins,lo,hi) |
 *   Frequency(a[,dtg,period],precision) |
 *   Z3Histogram(geom,dtg,period,res) | Z3Frequency(geom,dtg,period,res) |
 *   IteratorStackCount()
 *
 * Spark mapping: every stat becomes aggregation COLUMNS, so one parsed
 * string is ONE aggregation pass (`df.agg(...)`, or
 * `df.groupBy(key).agg(...)` for GroupBy) — the monoidal observe/merge
 * of the reference's Stat instances IS Spark's partial/final
 * aggregation. Map-valued stats (Enumeration, TopK, Z3Histogram) are
 * typed Aggregators over an exact count map; like the reference's
 * EnumerationStat, memory is O(distinct values) — use Frequency (a
 * count-min sketch) for unbounded key domains.
 *
 * A top-level GroupBy must be the only stat in the string (its output
 * shape is per-group, not one row); the reference's SeqStat has the
 * same practical restriction on merging.
 */
object StatDsl {

  // ---- grammar --------------------------------------------------------

  sealed trait Spec
  final case class CountSpec() extends Spec
  final case class MinMaxSpec(attr: String) extends Spec
  final case class EnumerationSpec(attr: String) extends Spec
  final case class TopKSpec(attr: String) extends Spec
  final case class DescriptiveSpec(attrs: Seq[String]) extends Spec
  final case class HistogramSpec(attr: String, bins: Int, lo: Double, hi: Double) extends Spec
  final case class FrequencySpec(attr: String, dtg: Option[(String, String)], precision: Int) extends Spec
  final case class Z3HistogramSpec(geom: String, dtg: String, period: String, res: Int) extends Spec
  final case class Z3FrequencySpec(geom: String, dtg: String, period: String, res: Int) extends Spec
  final case class IteratorStackSpec() extends Spec
  final case class GroupBySpec(attr: String, nested: Seq[Spec]) extends Spec

  /** Split on a separator at paren depth 0 (quotes respected). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quoted = false
    s.foreach { c =>
      if (c == '"') { quoted = !quoted; cur += c }
      else if (quoted) cur += c
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.toString; cur.clear() }
      else cur += c
    }
    require(depth == 0 && !quoted, s"unbalanced parens/quotes in stat string: $s")
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1) else t
  }

  private val StatRe = """(?s)\s*([A-Za-z0-9]+)\s*\((.*)\)\s*""".r

  private val Periods = Set("day", "week", "month", "year")

  def parseSpecs(stat: String): Seq[Spec] = splitTop(stat, ';').map(parseOne)

  private def parseOne(s: String): Spec = s match {
    case StatRe(name, body) =>
      def args = splitTop(body, ',').map(unquote)
      name match {
        case "Count" =>
          require(body.trim.isEmpty, "Count takes no arguments"); CountSpec()
        case "IteratorStackCount" =>
          require(body.trim.isEmpty, "IteratorStackCount takes no arguments"); IteratorStackSpec()
        case "MinMax" => require(args.size == 1, "MinMax(attribute)"); MinMaxSpec(args.head)
        case "Enumeration" => require(args.size == 1, "Enumeration(attribute)"); EnumerationSpec(args.head)
        case "TopK" => require(args.size == 1, "TopK(attribute)"); TopKSpec(args.head)
        case "DescriptiveStats" =>
          require(args.nonEmpty, "DescriptiveStats(a,b,...)"); DescriptiveSpec(args)
        case "Histogram" =>
          require(args.size == 4, "Histogram(attribute,bins,lower,upper)")
          val (bins, lo, hi) = (args(1).toInt, args(2).toDouble, args(3).toDouble)
          require(bins > 0, s"Histogram bins must be positive, got $bins")
          require(lo < hi, s"Histogram needs lower < upper, got [$lo, $hi)")
          HistogramSpec(args(0), bins, lo, hi)
        case "Frequency" =>
          args.size match {
            case 2 => FrequencySpec(args(0), None, args(1).toInt)
            case 4 =>
              require(Periods(args(2).toLowerCase), s"bad time period ${args(2)}")
              FrequencySpec(args(0), Some((args(1), args(2).toLowerCase)), args(3).toInt)
            case _ => throw new IllegalArgumentException("Frequency(attr[,dtg,period],precision)")
          }
        case "Z3Histogram" =>
          require(args.size == 4 && Periods(args(2).toLowerCase), "Z3Histogram(geom,dtg,period,res)")
          Z3HistogramSpec(args(0), args(1), args(2).toLowerCase, args(3).toInt)
        case "Z3Frequency" =>
          require(args.size == 4 && Periods(args(2).toLowerCase), "Z3Frequency(geom,dtg,period,res)")
          Z3FrequencySpec(args(0), args(1), args(2).toLowerCase, args(3).toInt)
        case "GroupBy" =>
          val parts = splitTop(body, ',')
          require(parts.size >= 2, "GroupBy(attribute,stats)")
          GroupBySpec(unquote(parts.head), parseSpecs(parts.tail.mkString(",")))
        case other => throw new IllegalArgumentException(s"unknown stat: $other")
      }
    case other => throw new IllegalArgumentException(s"invalid stat string: '$other'")
  }

  // ---- aggregators for map-valued stats --------------------------------

  /** Exact value -> count map (EnumerationStat analog). */
  private object CountMapAgg extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], k: String): Map[String, Long] =
      if (k == null) m else m.updated(k, m.getOrElse(k, 0L) + 1L)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(m: Map[String, Long]): Map[String, Long] = m
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** TopK (k=10, the reference default) with a deterministic tiebreak. */
  private object TopKAgg extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], k: String): Map[String, Long] =
      if (k == null) m else m.updated(k, m.getOrElse(k, 0L) + 1L)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  }

  /** Fixed-bin numeric histogram; out-of-range values clamp to the end
    * bins (reference BinnedArray endpoint behavior). */
  private final class HistogramAgg(lo: Double, hi: Double, bins: Int)
      extends Aggregator[java.lang.Double, Array[Long], Seq[Long]] {
    private def bin(v: Double): Int =
      math.min(bins - 1, math.max(0, math.floor((v - lo) / ((hi - lo) / bins)).toInt))
    override def zero: Array[Long] = new Array[Long](bins)
    override def reduce(b: Array[Long], v: java.lang.Double): Array[Long] = {
      if (v != null) b(bin(v.doubleValue())) += 1
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  // ---- spec -> aggregation columns --------------------------------------

  // named-udf registry refs, NOT expr("st_..."): the SQL text form only
  // resolves when StFunctions.register was called on the session — a
  // hidden dependency a bare StatDsl.parse caller would trip over
  private def z3Key(geom: String, dtg: String, period: String, res: Int): Column =
    concat_ws(":",
      graft.functions.StFunctions.fn("st_z3bin")(
        unix_millis(col(dtg).cast("timestamp")), lit(period)),
      graft.functions.StFunctions.fn("st_cell")(col(geom), lit(res)))

  private def z3Bin(dtg: String, period: String): Column =
    graft.functions.StFunctions.fn("st_z3bin")(
      unix_millis(col(dtg).cast("timestamp")), lit(period))

  // private: IteratorStackCount's column references PidCol, which only
  // parse() pre-projects — exposing this would hand callers a column
  // set that cannot resolve on a raw DataFrame
  private def columns(specs: Seq[Spec]): Seq[Column] = specs.flatMap {
    case CountSpec() => Seq(count(lit(1)).as("count"))
    case IteratorStackSpec() =>
      // aggregates over nondeterministic expressions are rejected by the
      // analyzer — parse() pre-projects the partition id into PidCol so
      // the aggregate argument is a plain attribute
      Seq(count_distinct(col(PidCol)).as("iterator_stack_count"))
    case MinMaxSpec(a) => Seq(
      min(col(a)).as(s"${a}_min"), max(col(a)).as(s"${a}_max"),
      approx_count_distinct(col(a)).as(s"${a}_cardinality"))
    case EnumerationSpec(a) =>
      Seq(udaf(CountMapAgg, Encoders.STRING)(col(a).cast("string")).as(s"${a}_enumeration"))
    case TopKSpec(a) =>
      Seq(udaf(TopKAgg, Encoders.STRING)(col(a).cast("string")).as(s"${a}_topk"))
    case DescriptiveSpec(cols) => cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_count"), min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"), avg(col(c)).as(s"${c}_mean"),
        var_samp(col(c)).as(s"${c}_var"), stddev_samp(col(c)).as(s"${c}_stddev"),
        skewness(col(c)).as(s"${c}_skew"), kurtosis(col(c)).as(s"${c}_kurt"))
    }
    case HistogramSpec(a, bins, lo, hi) =>
      Seq(udaf(new HistogramAgg(lo, hi, bins), Encoders.DOUBLE)(col(a).cast("double"))
        .as(s"${a}_histogram"))
    case FrequencySpec(a, dtgOpt, precision) =>
      // count-min sketch; the reference's precision scales the sketch
      // width the same way eps does here. With a dtg the key is
      // period-binned (Frequency.scala time-binned sketches).
      val eps = 1.0 / math.max(10, precision)
      val key = dtgOpt match {
        case Some((dtg, period)) =>
          concat_ws(":", z3Bin(dtg, period), col(a).cast("string"))
        case None => col(a).cast("string")
      }
      Seq(count_min_sketch(key, lit(eps), lit(0.99), lit(42)).as(s"${a}_frequency"))
    case Z3HistogramSpec(geom, dtg, period, res) =>
      Seq(udaf(CountMapAgg, Encoders.STRING)(z3Key(geom, dtg, period, res))
        .as(s"${geom}_z3_histogram"))
    case Z3FrequencySpec(geom, dtg, period, res) =>
      Seq(count_min_sketch(z3Key(geom, dtg, period, res), lit(0.001), lit(0.99), lit(42))
        .as(s"${geom}_z3_frequency"))
    case g: GroupBySpec =>
      throw new IllegalArgumentException("GroupBy must be the only top-level stat")
  }

  /** Parse a stat string and run it as one aggregation pass. */
  private val PidCol = "__graft_pid"

  private def needsPid(specs: Seq[Spec]): Boolean = specs.exists {
    case IteratorStackSpec() => true
    case GroupBySpec(_, nested) => needsPid(nested)
    case _ => false
  }

  def parse(df0: DataFrame, stat: String): DataFrame = parseSpecs(stat) match {
    case Seq() =>
      throw new IllegalArgumentException(
        s"stat string '$stat' contains no stats — expected e.g. \"MinMax(a);Count()\"")
    case specs =>
      val df = if (needsPid(specs)) df0.withColumn(PidCol, spark_partition_id()) else df0
      specs match {
        case Seq(GroupBySpec(attr, nested)) =>
          val cs = columns(nested)
          df.groupBy(col(attr)).agg(cs.head, cs.tail: _*)
        case _ =>
          val cs = columns(specs)
          df.agg(cs.head, cs.tail: _*)
      }
  }
}
