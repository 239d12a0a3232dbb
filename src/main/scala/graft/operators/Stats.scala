package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import graft.geom.GeomOps
import graft.functions.StFunctions

/**
 * Aggregation surface — the Spark-native mapping of the reference's Stat
 * DSL (geomesa-utils/.../stats/Stat.scala and the per-stat classes) and
 * its ConvexHull UDAF. The monoidal observe/merge pattern of
 * AggregatingScan + client reduce IS Spark's partial/final aggregation,
 * so most stats are built-ins; the genuinely custom ones are typed
 * `Aggregator`s (the UDAF API the reference used was removed in Spark 4).
 */
object Stats {

  private def unaryUnion(wkbs: Seq[Array[Byte]]): org.locationtech.jts.geom.Geometry = {
    import scala.jdk.CollectionConverters._
    org.locationtech.jts.operation.union.UnaryUnionOp.union(
      wkbs.map(GeomOps.fromWkb).asJava)
  }

  /** ConvexHull: geometry-valued aggregate (reference: geomesa-spark-jts
    * ConvexHull.scala:16-51). Buffer = a list of WKBs collapsing to ONE
    * hull whenever it reaches 64 entries. The hull depends only on the
    * coordinate set, so a collapse is convexHull over the collection
    * (O(n log n) on coordinates) — NO overlay union — and every
    * collapsed entry is a small hull, so repeated re-collapse stays
    * cheap (unlike the union aggregate, whose combined entries grow). */
  object ConvexHullAgg extends Aggregator[Array[Byte], Seq[Array[Byte]], Array[Byte]] {
    private def hull(wkbs: Seq[Array[Byte]]): Array[Byte] = {
      import scala.jdk.CollectionConverters._
      GeomOps.toWkb(GeomOps.factory
        .buildGeometry(wkbs.map(GeomOps.fromWkb).asJava).convexHull())
    }
    private def maybe(s: Seq[Array[Byte]]): Seq[Array[Byte]] =
      if (s.lengthCompare(64) < 0) s else Seq(hull(s))
    override def zero: Seq[Array[Byte]] = Nil
    override def reduce(buf: Seq[Array[Byte]], wkb: Array[Byte]): Seq[Array[Byte]] =
      if (wkb == null) buf else maybe(buf :+ wkb)
    override def merge(a: Seq[Array[Byte]], b: Seq[Array[Byte]]): Seq[Array[Byte]] =
      maybe(a ++ b)
    override def finish(buf: Seq[Array[Byte]]): Array[Byte] =
      if (buf.isEmpty) null else hull(buf)
    override def bufferEncoder: Encoder[Seq[Array[Byte]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Array[Byte]]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column form: st_convexHull aggregate over a WKB geometry column. */
  def convexHull(geomWkb: Column): Column = udaf(ConvexHullAgg).apply(geomWkb)

  /** Geometric union aggregate (the reference's TubeBuilder
    * unionFeatures, tube/TubeBuilder.scala:149-160). The old form (one
    * running WKB incrementally overlaid per row) was quadratic — a
    * 67k-geometry group burned 10+ minutes of one core at sf0.1. The
    * buffer is a BINARY-COUNTER cascade: each entry is [level][wkb];
    * a new row pushes level 0, and while the top two entries share a
    * level they pair-union into level+1 (mergesort shape — every
    * geometry participates in O(log n) unions, total O(n log n), ≤ ~64
    * entries ever buffered). A plain collapse-all-at-64 rule is NOT
    * enough: its collapsed entry re-enters every later collapse, and
    * re-unioning the ever-growing accumulation per 63 rows is still
    * quadratic with a bigger constant. */
  object UnionAgg extends Aggregator[Array[Byte], Seq[Array[Byte]], Array[Byte]] {
    private def entry(level: Int, wkb: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](wkb.length + 1)
      out(0) = level.toByte
      System.arraycopy(wkb, 0, out, 1, wkb.length)
      out
    }
    private def pairUnion(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      GeomOps.toWkb(GeomOps.fromWkb(a.drop(1)).union(GeomOps.fromWkb(b.drop(1))))
    /** Push one entry, then merge while the top two levels match. */
    private def push(buf: List[Array[Byte]], e: Array[Byte]): List[Array[Byte]] = buf match {
      case top :: rest if top(0) == e(0) =>
        push(rest, entry(math.min(e(0) + 1, 127), pairUnion(top, e)))
      case _ => e :: buf
    }
    override def zero: Seq[Array[Byte]] = Nil
    override def reduce(buf: Seq[Array[Byte]], wkb: Array[Byte]): Seq[Array[Byte]] =
      if (wkb == null) buf else push(buf.toList, entry(0, wkb))
    override def merge(a: Seq[Array[Byte]], b: Seq[Array[Byte]]): Seq[Array[Byte]] =
      // push b's entries shallowest-first so same-level runs cascade
      b.sortBy(e => -e(0)).foldLeft(a.toList)((acc, e) => push(acc, e))
    override def finish(buf: Seq[Array[Byte]]): Array[Byte] =
      if (buf.isEmpty) null
      else GeomOps.toWkb(unaryUnion(buf.map(_.drop(1))))
    override def bufferEncoder: Encoder[Seq[Array[Byte]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Array[Byte]]]()
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column form: geometric union aggregate over a WKB geometry column. */
  def geomUnion(geomWkb: Column): Column = udaf(UnionAgg).apply(geomWkb)

  /** Bounds: envelope-of-all aggregate (cheap MinMax over coordinates). */
  def envelopeAgg(df: DataFrame, geomCol: String): DataFrame = {
    val env = udf { (wkb: Array[Byte]) =>
      val e = GeomOps.fromWkb(wkb).getEnvelopeInternal
      (e.getMinX, e.getMinY, e.getMaxX, e.getMaxY)
    }
    df.withColumn("__e", env(col(geomCol)))
      .agg(min("__e._1").as("xmin"), min("__e._2").as("ymin"),
        max("__e._3").as("xmax"), max("__e._4").as("ymax"))
  }

  /** DescriptiveStats analog (stats/DescriptiveStats.scala): one pass of
    * built-in moments per column. */
  def descriptive(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_count"), min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"), avg(col(c)).as(s"${c}_mean"),
        var_samp(col(c)).as(s"${c}_var"), stddev_samp(col(c)).as(s"${c}_stddev"),
        skewness(col(c)).as(s"${c}_skew"), kurtosis(col(c)).as(s"${c}_kurt"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** MinMax + HLL cardinality (stats/MinMax.scala: clearspring HLL ->
    * Spark's HyperLogLog++ approx_count_distinct). */
  def minMaxCardinality(df: DataFrame, c: String): DataFrame =
    df.agg(min(col(c)).as("min"), max(col(c)).as("max"),
      approx_count_distinct(col(c)).as("approx_cardinality"),
      count(col(c)).as("count"))

  /** TopK (stats/TopK.scala StreamSummary -> exact groupBy + limit; at
    * 10^12 rows the partial aggregation bounds the shuffle to one row
    * per distinct value per partition). */
  def topK(df: DataFrame, c: String, k: Int): DataFrame =
    df.groupBy(c).count().orderBy(desc("count"), col(c)).limit(k)

  /** Frequency / count-min sketch (stats/Frequency.scala -> built-in). */
  def countMinSketch(df: DataFrame, c: String, eps: Double = 0.001,
                     confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.agg(count_min_sketch(col(c), lit(eps), lit(confidence), lit(seed)).as("cms"))

  /** Fixed-bin numeric histogram (stats/Histogram.scala + BinnedArray). */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double, bins: Int): DataFrame = {
    val w = (hi - lo) / bins
    df.where(col(c).between(lo, hi))
      .withColumn("bin", least(lit(bins - 1), floor((col(c) - lo) / w)).cast("int"))
      .groupBy("bin").count().orderBy("bin")
  }

  /** Z3Histogram analog (stats/Z3Histogram.scala): counts keyed by
    * (time bin, coarse cell) — the spatio-temporal density sketch. */
  def z3Histogram(df: DataFrame, lonCol: String, latCol: String, millisCol: String,
                  period: String, cellRes: Int): DataFrame =
    df.withColumn("time_bin", StFunctions.stZ3Bin(col(millisCol), lit(period)))
      .withColumn("cell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(cellRes)))
      .groupBy("time_bin", "cell").count()

  /** Z3Frequency analog (stats/Z3Frequency.scala:1-149): one count-min
    * sketch PER time bin over the coarse cell — the time-binned
    * frequency sketch the reference uses to answer "how hot was this
    * region during week W" without exact counts. Returns (time_bin,
    * cms binary); query a value by probing the bin's sketch. */
  def z3Frequency(df: DataFrame, lonCol: String, latCol: String, millisCol: String,
                  period: String, cellRes: Int,
                  eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.withColumn("time_bin", StFunctions.stZ3Bin(col(millisCol), lit(period)))
      .withColumn("cell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(cellRes)))
      .groupBy("time_bin")
      .agg(count_min_sketch(col("cell"), lit(eps), lit(confidence), lit(seed)).as("cms"),
        count(lit(1)).as("n"))

  /** Full covariance/correlation matrix across numeric columns in ONE
    * aggregation pass (DescriptiveStats.scala co-moments analog): all
    * pairwise covar_samp + corr as flat columns `cov_a_b` / `corr_a_b`. */
  def covarianceMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need >= 2 columns")
    val aggs = for {
      i <- cols.indices; j <- cols.indices if j > i
      a = cols(i); b = cols(j)
      e <- Seq(covar_samp(col(a), col(b)).as(s"cov_${a}_$b"),
        corr(col(a), col(b)).as(s"corr_${a}_$b"))
    } yield e
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Map aggregation (the reference's map-valued stats): exact
    * value -> count as a MapType column per group. Null values are
    * excluded (a map key cannot be null; dirty data must not fail the
    * aggregation). */
  def mapCounts(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.where(col(valueCol).isNotNull)
      .groupBy(keyCol, valueCol).count()
      .groupBy(keyCol)
      .agg(map_from_entries(collect_list(struct(col(valueCol), col("count")))).as("value_counts"))

  /** Enumeration (exact value -> count map; stats/EnumerationStat.scala). */
  def enumeration(df: DataFrame, c: String): DataFrame = df.groupBy(c).count()

  /** GroupBy-stat nesting (stats/GroupBy.scala): any of the above per
    * group key is plain `groupBy(key).agg(...)` — provided as a helper
    * for the common minmax case. */
  def groupedMinMax(df: DataFrame, key: String, c: String): DataFrame =
    df.groupBy(key).agg(min(col(c)).as("min"), max(col(c)).as("max"),
      count(col(c)).as("count"))

  /** IteratorStackCount analog: how many physical partitions produced
    * rows (diagnostic). */
  def partitionCount(df: DataFrame): Long =
    df.select(spark_partition_id().as("p")).distinct().count()

  /** BIN-record projection (BinAggregatingScan analog): the wire-compact
    * (trackHash:int, dtgSeconds:int, lat:float, lon:float) layout as
    * columns; writing it to Parquet/binary is the export.
    * `hashTrack=false` treats trackCol as an already-computed int hash
    * (lets callers supply an engine-portable hash for cross-checking). */
  def binRecords(df: DataFrame, trackCol: String, millisCol: String,
                 lonCol: String, latCol: String, hashTrack: Boolean = true): DataFrame =
    df.select(
      (if (hashTrack) hash(col(trackCol)) else col(trackCol).cast("int")).as("track_hash"),
      (col(millisCol) / 1000L).cast("int").as("dtg_s"),
      col(latCol).cast("float").as("lat"),
      col(lonCol).cast("float").as("lon"))
}
