package graft.table

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.{ChronoUnit, WeekFields}

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, StringType, TimestampType}
import org.locationtech.jts.geom.{Envelope, Point}

import graft.cells.{NormalizedDimension, Z2, ZRangeCover}
import graft.plans.{Cql, SpatialFilterRule}

/** File-layout partition schemes — the reference FS datastore's
  * `PartitionScheme` family (geomesa-fs-storage-common/.../partitions/
  * DateTimeScheme.scala:21-143, Z2Scheme.scala:22-119,
  * CompositeScheme.scala:19-47, FlatScheme.scala:17-33, and the factory
  * in PartitionScheme.scala:20-100), re-expressed Spark-first:
  *
  *  - `getPartition(feature)` becomes [[PartitionScheme.partitionCol]] —
  *    a pure-codegen Catalyst Column (format_string/concat over date
  *    parts; unrolled bit-interleave for z2), evaluated distributed at
  *    write time instead of per-feature on a single writer. The
  *    driver-side [[PartitionScheme.partitionOf]] keeps the reference's
  *    single-feature API for parity tests and tooling.
  *  - `getPartitions(filter)` becomes [[PartitionScheme.partitions]] —
  *    the query-time partition cover, driven by the same CQL surface
  *    ([[graft.plans.Cql]]) the reference feeds through ECQL.toFilter.
  *  - The storage integration is Hive-style `partitionBy` over one
  *    column per path segment ([[PartitionScheme.write]]), so Spark's
  *    own partition pruning replaces the reference's directory-walk
  *    listing: [[PartitionScheme.read]] turns the cover into per-level
  *    `isin` predicates over the partition columns — predicates the
  *    FileSourceStrategy evaluates at planning time against the
  *    partition values, scanning only covered directories. Per-level
  *    membership is exactly as selective as the reference's
  *    cross-product enumeration for composite schemes (the covers are
  *    independent per sub-scheme) and strictly more robust: a level
  *    whose filter cannot be bounded simply skips pruning instead of
  *    enumerating from year 0 (DateTimeScheme.scala:27 MinDateTime).
  *
  * Scale notes (100 TB): partition computation is map-side codegen (no
  * UDF, no shuffle); the cover is computed once on the driver from the
  * filter literals; enumerations are guarded ([[PartitionScheme.MaxCover]])
  * so a filter that would cover more partitions than a directory listing
  * can healthily hold degrades to "scan + filter" instead of building a
  * million-entry IN list. Session timezone must be UTC (asserted in
  * write/read) — the reference hard-codes ZoneOffset.UTC.
  *
  * Weekly partitions use ISO week numbering on BOTH the distributed and
  * driver paths (Spark's `weekofyear` is ISO); the reference's 'ww' is
  * locale-week. The two agree on the reference's own fixtures; at ISO
  * year boundaries the reference's 'yyyy/ww' pairing is itself
  * inconsistent (year-of-era with week-of-year), so we standardize.
  */
sealed trait PartitionScheme {

  import PartitionScheme._

  def name: String
  def options: Map[String, String]
  def leaf: Boolean
  /** Reference getMaxDepth parity: datetime = slash count, z2 = 1,
    * flat = 0, composite = sum. */
  def maxDepth: Int

  /** One Column per path segment (the '/'-separated levels of the
    * reference's partition names). Empty for the flat scheme. */
  def segmentCols(resolve: Resolver): Seq[Column]

  /** Driver-side partition name for one feature — reference
    * `getPartition` parity. `get` resolves an attribute name to its
    * value (Date/Timestamp/Instant for dtg; JTS Point or (lon, lat)
    * tuple for geom). */
  def partitionOf(get: String => Any): String

  /** Partition-name cover for this scheme's fields over the filter's
    * conjuncts. None = the filter does not bound this scheme's field
    * tightly enough to enumerate (or the enumeration exceeds
    * [[PartitionScheme.MaxCover]]). */
  private[table] def cover(conjuncts: Seq[Expression]): Option[Seq[String]]

  final def partitionCol(resolve: Resolver): Column = {
    val segs = segmentCols(resolve)
    if (segs.isEmpty) lit("") else concat_ws("/", segs: _*)
  }

  final def numSegments: Int = maxSegments(this)

  /** Reference `getPartitions(filter)` parity: the full partition-name
    * enumeration covering a CQL filter. Throws (rather than silently
    * materializing an unbounded list) when a datetime level is not
    * bounded by the filter or the cover exceeds [[PartitionScheme.MaxCover]]
    * — the reference would enumerate from year 0 (DateTimeScheme.scala:27).
    * Use [[PartitionScheme.read]] for the degrade-gracefully form. */
  final def partitions(filter: Column): Seq[String] =
    cover(splitConjuncts(expressionOf(filter))).getOrElse(
      throw new IllegalArgumentException(
        s"filter does not bound scheme '$name' to <= $MaxCover partitions; " +
          "narrow the filter or read without enumeration"))

  final def partitionsCql(cql: String, props: Map[String, Column] = Map.empty): Seq[String] =
    cover(splitConjuncts(expressionOf(Cql.parse(cql, props))).map(unalias(_, props)))
      .getOrElse(throw new IllegalArgumentException(
        s"filter does not bound scheme '$name' to <= $MaxCover partitions; " +
          "narrow the filter or read without enumeration"))
}

object PartitionScheme {

  /** Enumeration guard for covers and per-level isin pruning lists. */
  val MaxCover = 65536

  /** How attribute names resolve to columns: `ts` must yield a
    * TimestampType column, `lonLat` the coordinate pair. The default
    * extracts point coordinates from a WKB geometry column via the
    * registered st_x/st_y functions. */
  trait Resolver {
    def ts(name: String): Column = col(name)
    def lonLat(name: String): (Column, Column) =
      (graft.functions.StFunctions.fn("st_x")(col(name)),
        graft.functions.StFunctions.fn("st_y")(col(name)))
  }
  object WkbResolver extends Resolver

  /** Resolver for tables that carry plain lon/lat double columns. */
  final case class LonLatResolver(lon: String, lat: String) extends Resolver {
    override def lonLat(name: String): (Column, Column) = (col(lon), col(lat))
  }

  // ---- datetime --------------------------------------------------------

  /** Named formats — reference DateTimeScheme.Formats (DateTimeScheme
    * .scala:91-107). */
  private val NamedFormats: Map[String, (String, ChronoUnit)] = Map(
    "minute" -> (("yyyy/MM/dd/HH/mm", ChronoUnit.MINUTES)),
    "hourly" -> (("yyyy/MM/dd/HH", ChronoUnit.HOURS)),
    "daily" -> (("yyyy/MM/dd", ChronoUnit.DAYS)),
    "weekly" -> (("yyyy/ww", ChronoUnit.WEEKS)),
    "monthly" -> (("yyyy/MM", ChronoUnit.MONTHS)),
    "julian-minute" -> (("yyyy/DDD/HH/mm", ChronoUnit.MINUTES)),
    "julian-hourly" -> (("yyyy/DDD/HH", ChronoUnit.HOURS)),
    "julian-daily" -> (("yyyy/DDD", ChronoUnit.DAYS)))

  private sealed trait Tok
  private final case class TLit(s: String) extends Tok
  private final case class TFld(letter: Char, width: Int) extends Tok

  private val FieldLetters = "yMdHmsDw".toSet

  private def tokenize(segment: String): Seq[Tok] = {
    val out = Seq.newBuilder[Tok]
    var i = 0
    while (i < segment.length) {
      val c = segment.charAt(i)
      if (c.isLetter) {
        require(FieldLetters(c), s"unsupported datetime pattern letter '$c' in '$segment' " +
          s"(supported: ${FieldLetters.toSeq.sorted.mkString(",")})")
        var j = i
        while (j < segment.length && segment.charAt(j) == c) j += 1
        out += TFld(c, j - i)
        i = j
      } else {
        var j = i
        while (j < segment.length && !segment.charAt(j).isLetter) j += 1
        out += TLit(segment.substring(i, j))
        i = j
      }
    }
    out.result()
  }

  private def fieldCol(letter: Char, ts: Column): Column = letter match {
    case 'y' => year(ts)
    case 'M' => month(ts)
    case 'd' => dayofmonth(ts)
    case 'H' => hour(ts)
    case 'm' => minute(ts)
    case 's' => second(ts)
    case 'D' => dayofyear(ts)
    case 'w' => weekofyear(ts)
  }

  private def fieldVal(letter: Char, z: ZonedDateTime): Int = letter match {
    case 'y' => z.getYear
    case 'M' => z.getMonthValue
    case 'd' => z.getDayOfMonth
    case 'H' => z.getHour
    case 'm' => z.getMinute
    case 's' => z.getSecond
    case 'D' => z.getDayOfYear
    case 'w' => z.get(WeekFields.ISO.weekOfWeekBasedYear())
  }

  private def toInstant(v: Any): Instant = v match {
    case i: Instant => i
    case t: java.sql.Timestamp => t.toInstant
    case d: java.util.Date => d.toInstant
    case l: java.lang.Long => Instant.ofEpochMilli(l)
    case s: String => Cql.parseInstant(s)
    case other => sys.error(s"not a datetime value: $other")
  }

  /** The reference's DateTimeScheme: one '/'-separated name per step of
    * `stepUnit`, formatted by `format`. */
  final case class DateTimeScheme(format: String, stepUnit: ChronoUnit, step: Int,
                                  dtg: String, leaf: Boolean) extends PartitionScheme {
    require(!format.endsWith("/"), "Format cannot end with a slash")

    private val segments: Seq[Seq[Tok]] = format.split('/').toSeq.map(tokenize)

    override def name: String = "datetime"
    override def maxDepth: Int = format.count(_ == '/')
    override def options: Map[String, String] = Map(
      "dtg-attribute" -> dtg,
      "datetime-format" -> format,
      "step-unit" -> stepUnit.toString,
      "step" -> step.toString,
      "leaf-storage" -> leaf.toString)

    override def segmentCols(resolve: Resolver): Seq[Column] = {
      val ts = resolve.ts(dtg)
      segments.map { toks =>
        val parts = toks.map {
          case TLit(s) => lit(s)
          case TFld(c, w) => format_string(s"%0${w}d", fieldCol(c, ts))
        }
        if (parts.size == 1) parts.head else concat(parts: _*)
      }
    }

    private[table] def formatName(z: ZonedDateTime): String =
      segments.map(_.map {
        case TLit(s) => s
        case TFld(c, w) => s"%0${w}d".format(fieldVal(c, z))
      }.mkString).mkString("/")

    override def partitionOf(get: String => Any): String =
      formatName(toInstant(get(dtg)).atZone(ZoneOffset.UTC))

    private[table] override def cover(conjuncts: Seq[Expression]): Option[Seq[String]] = {
      timeBounds(conjuncts, dtg).flatMap { case (lo, hi) =>
        if (lo.isAfter(hi)) Some(Nil)
        else {
          // reference enumeration (DateTimeScheme.scala:45-48), with two
          // deliberate fixes over it: `between` floors on un-truncated
          // instants, which can drop hi's own partition when lo's
          // sub-unit offset exceeds hi's (a pruned read would silently
          // lose rows) — formatName(hi) is appended explicitly; and the
          // step divides the count instead of multiplying the stride
          // past hi (the reference overshoots by (step-1)*between units).
          val count = stepUnit.between(lo, hi) / step + 1
          if (count > MaxCover) None
          else Some(
            (Seq.tabulate(count.toInt)(i => formatName(lo.plus(step.toLong * i, stepUnit))) :+
              formatName(hi)).distinct)
        }
      }
    }
  }

  // ---- z2 --------------------------------------------------------------

  /** The reference's Z2Scheme: the z-value of the point at `bits`/2 bits
    * per dimension, zero-padded to the decimal width of 2^bits. */
  final case class Z2Scheme(bits: Int, geom: String, leaf: Boolean) extends PartitionScheme {
    require(bits % 2 == 0, "Resolution must be an even number")
    require(bits > 0 && bits <= 30, s"z2 bits $bits out of (0, 30]")

    private val bitsPerDim = bits / 2
    private val digits = math.ceil(math.log10(math.pow(2, bits))).toInt
    private val nLon = NormalizedDimension.lon(bitsPerDim)
    private val nLat = NormalizedDimension.lat(bitsPerDim)

    override def name: String = "z2"
    override def maxDepth: Int = 1
    override def options: Map[String, String] = Map(
      "geom-attribute" -> geom,
      "z2-resolution" -> bits.toString,
      "leaf-storage" -> leaf.toString)

    /** Clamped floor-normalization as a Column — the exact arithmetic of
      * [[NormalizedDimension.normalize]] (same double multiply, same
      * truncation toward zero on a non-negative value). */
    private def normCol(c: Column, dim: NormalizedDimension): Column = {
      val scale = dim.bins / (dim.max - dim.min)
      when(c <= dim.min, lit(0L))
        .when(c >= dim.max, lit(dim.maxIndex.toLong))
        .otherwise(least(lit(dim.maxIndex.toLong), ((c - dim.min) * scale).cast(LongType)))
    }

    override def segmentCols(resolve: Resolver): Seq[Column] = {
      val (lonC, latC) = resolve.lonLat(geom)
      val nx = normCol(lonC, nLon)
      val ny = normCol(latC, nLat)
      // unrolled Morton interleave: pure codegen, static per scheme
      val z = (0 until bitsPerDim).map { i =>
        shiftleft(shiftright(nx, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(ny, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
      Seq(format_string(s"%0${digits}d", z))
    }

    override def partitionOf(get: String => Any): String = {
      val (x, y) = get(geom) match {
        case p: Point => (p.getX, p.getY)
        case (a: Double, b: Double) => (a, b)
        case other => sys.error(s"not a point value: $other")
      }
      s"%0${digits}d".format(Z2.index(nLon.normalize(x).toLong, nLat.normalize(y).toLong))
    }

    private[table] override def cover(conjuncts: Seq[Expression]): Option[Seq[String]] = {
      envelopeOf(conjuncts, geom) match {
        case None => Some(Nil) // filter geometry disjoint from the world
        case Some(env) =>
          val (x0, y0) = (nLon.normalize(env.getMinX), nLat.normalize(env.getMinY))
          val (x1, y1) = (nLon.normalize(env.getMaxX), nLat.normalize(env.getMaxY))
          // the cover is exact (budget >= cell count), so the covered
          // total IS the rectangle area — guard before building the BFS
          val cells = (x1 - x0 + 1).toLong * (y1 - y0 + 1).toLong
          if (cells > MaxCover) None
          else {
            val ranges = ZRangeCover.z2Ranges(x0, y0, x1, y1,
              bitsPerDim = bitsPerDim, maxRanges = Int.MaxValue, maxLevels = bitsPerDim)
            Some(ranges.flatMap(r => (r.lower to r.upper).map(z => s"%0${digits}d".format(z))))
          }
      }
    }
  }

  // ---- flat / composite ------------------------------------------------

  /** Reference FlatScheme: everything in one (root) partition. */
  case object FlatScheme extends PartitionScheme {
    override def name: String = "flat"
    override def maxDepth: Int = 0
    override def leaf: Boolean = true
    override def options: Map[String, String] = Map.empty
    override def segmentCols(resolve: Resolver): Seq[Column] = Nil
    override def partitionOf(get: String => Any): String = ""
    private[table] override def cover(conjuncts: Seq[Expression]): Option[Seq[String]] =
      Some(Seq(""))
  }

  /** Reference CompositeScheme: sub-scheme names joined with '/'. */
  final case class CompositeScheme(schemes: Seq[PartitionScheme]) extends PartitionScheme {
    require(schemes.lengthCompare(1) > 0, "Must provide at least 2 schemes for a composite scheme")
    require(schemes.map(_.leaf).distinct.lengthCompare(1) == 0,
      "All schemes must share the same value for isLeafStorage")

    override def name: String = schemes.map(_.name).mkString(",")
    override def maxDepth: Int = schemes.map(_.maxDepth).sum
    override def leaf: Boolean = schemes.head.leaf
    override def options: Map[String, String] =
      schemes.map(_.options).reduceLeft(_ ++ _)
    override def segmentCols(resolve: Resolver): Seq[Column] =
      schemes.flatMap(_.segmentCols(resolve))
    override def partitionOf(get: String => Any): String =
      schemes.map(_.partitionOf(get)).mkString("/")

    private[table] override def cover(conjuncts: Seq[Expression]): Option[Seq[String]] = {
      val covers = schemes.map(_.cover(conjuncts))
      if (covers.exists(_.isEmpty)) None
      else {
        // guard on the PRODUCT before materializing: two sub-covers just
        // under the guard would otherwise build billions of strings
        val product = covers.map(_.get.size.toLong).product
        if (product > MaxCover) None
        else Some(covers.map(_.get).reduce((a, b) => for (i <- a; j <- b) yield s"$i/$j"))
      }
    }
  }

  // ---- factory (reference PartitionScheme.apply + scheme factories) ----

  private val Z2Name = """z2(?:-([0-9]+)bits?)?""".r

  def apply(sft: Sft.Schema, name: String, opts: Map[String, String] = Map.empty): PartitionScheme = {
    def dtgField: String =
      opts.getOrElse("dtg-attribute", sft.defaultDate.getOrElse(
        throw new IllegalArgumentException("DateTime scheme requires valid attribute 'dtg-attribute'")))
    def geomField: String =
      opts.getOrElse("geom-attribute", sft.defaultGeometry.getOrElse(
        throw new IllegalArgumentException("Z2 scheme requires valid geometry field 'geom-attribute'")))
    def fieldCheck(f: String): String = {
      if (!sft.fields.exists(_.name == f))
        throw new IllegalArgumentException(s"Attribute '$f' does not exist in simple feature type ${sft.typeName}")
      f
    }
    val leaf = opts.get("leaf-storage").forall(_.toBoolean)
    val step = opts.get("step").map(_.toInt).getOrElse(1)

    name match {
      case n if n.contains(",") =>
        CompositeScheme(n.split(',').toSeq.map(part => apply(sft, part.trim, opts)))
      case "flat" => FlatScheme
      case "datetime" =>
        val unit = opts.get("step-unit").map(u => ChronoUnit.valueOf(u.toUpperCase)).getOrElse(
          throw new IllegalArgumentException("DateTime scheme requires valid unit 'step-unit'"))
        val format = opts.getOrElse("datetime-format",
          throw new IllegalArgumentException("DateTime scheme requires valid format 'datetime-format'"))
        DateTimeScheme(format, unit, step, fieldCheck(dtgField), leaf)
      case n if NamedFormats.contains(n.toLowerCase) =>
        val (format, unit) = NamedFormats(n.toLowerCase)
        DateTimeScheme(format, unit, step, fieldCheck(dtgField), leaf)
      case Z2Name(bitsGroup) =>
        val bits = Option(bitsGroup).filter(_.nonEmpty).orElse(opts.get("z2-resolution"))
          .map(_.toInt).getOrElse(
            throw new IllegalArgumentException("Z2 scheme requires bit resolution 'z2-resolution'"))
        Z2Scheme(bits, fieldCheck(geomField), leaf)
      case other =>
        throw new IllegalArgumentException(s"Could not load partition scheme from '$other' - $opts")
    }
  }

  /** Config form — reference PartitionScheme.apply(sft, conf)
    * (PartitionScheme.scala:75-88): `{"scheme": name, "options": {...}}`.
    * JSON subset of HOCON, consistent with sources/ConverterConfig. */
  def fromConfig(sft: Sft.Schema, configJson: String): PartitionScheme = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.readTree(configJson)
    require(n.has("scheme"), "config must have a scheme")
    require(n.has("options"), "config must have options for scheme")
    val opts = {
      val it = n.get("options").fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }
    apply(sft, n.get("scheme").asText(), opts)
  }

  /** Reference PartitionScheme.toConfig parity (concise render). */
  def toConfig(scheme: PartitionScheme): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("scheme", scheme.name)
    val opts = root.putObject("options")
    scheme.options.toSeq.sortBy(_._1).foreach { case (k, v) => opts.put(k, v) }
    mapper.writeValueAsString(root)
  }

  // ---- storage integration --------------------------------------------

  private def maxSegments(s: PartitionScheme): Int = s match {
    case d: DateTimeScheme => d.format.count(_ == '/') + 1
    case _: Z2Scheme => 1
    case FlatScheme => 0
    case c: CompositeScheme => c.schemes.map(maxSegments).sum
  }

  private def segNames(scheme: PartitionScheme): Seq[String] =
    (0 until maxSegments(scheme)).map(i => s"_p$i")

  private def requireUtc(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC", s"partition schemes require spark.sql.session.timeZone=UTC (was $tz) " +
      "— the reference formats partitions at ZoneOffset.UTC")
  }

  /** Storage encodings the reference's FS datastore supports
    * (ParquetFileSystemStorage / OrcFileSystemStorage) — both are
    * Spark-native columnar sources with identical partition-pruning and
    * predicate-pushdown behavior here. */
  private val Formats = Set("parquet", "orc")
  private def requireFormat(format: String): Unit =
    require(Formats.contains(format), s"unsupported storage format '$format' (parquet|orc)")

  /** Write `df` under `path` in the scheme's directory layout: one
    * Hive-style partition directory per path segment. The scheme config
    * is persisted alongside (`_scheme.json`) like the reference stores
    * it in the sft user data / metadata file. `format` selects the
    * file encoding (reference: geomesa-fs-storage-parquet / -orc). */
  def write(df: DataFrame, path: String, scheme: PartitionScheme,
            resolve: Resolver = WkbResolver, format: String = "parquet"): Unit = {
    requireUtc(df.sparkSession)
    requireFormat(format)
    val segs = scheme.segmentCols(resolve)
    val names = segNames(scheme)
    if (names.isEmpty) df.write.mode("overwrite").format(format).save(path)
    else {
      names.zip(segs).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
        .write.mode("overwrite").partitionBy(names: _*).format(format).save(path)
    }
    persistScheme(df.sparkSession, path, scheme, overwrite = true)
  }

  /** Incremental write — the FS storage's appending writer semantics
    * (MetadataFileSystemStorage.getWriter: every writer session lands a
    * NEW data file in its partition directory; CompactionTest asserts
    * one file per write). Appends accumulate small files by design;
    * [[compact]] merges them. The scheme config is persisted on the
    * first write only (appends must not race the marker). */
  def append(df: DataFrame, path: String, scheme: PartitionScheme,
             resolve: Resolver = WkbResolver, format: String = "parquet"): Unit = {
    requireUtc(df.sparkSession)
    requireFormat(format)
    val segs = scheme.segmentCols(resolve)
    val names = segNames(scheme)
    val out = names.zip(segs).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    if (names.isEmpty) out.write.mode("append").format(format).save(path)
    else out.write.mode("append").partitionBy(names: _*).format(format).save(path)
    persistScheme(df.sparkSession, path, scheme, overwrite = false)
  }

  private def persistScheme(spark: SparkSession, path: String,
                            scheme: PartitionScheme, overwrite: Boolean): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_scheme.json")
    if (!overwrite && fs.exists(marker)) return
    val out = fs.create(marker, true)
    try out.write(toConfig(scheme).getBytes("UTF-8")) finally out.close()
  }

  /** Leaf partition directories (relative `_p0=a/_p1=b` paths; the empty
    * string for a flat scheme) mapped to their data files. Listed from
    * the filesystem — the storage's metadata IS the layout here, like
    * `getMetadata.getFiles` over the reference's metadata file. */
  def partitionFiles(spark: SparkSession, path: String,
                     scheme: PartitionScheme): Map[String, Seq[org.apache.hadoop.fs.Path]] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val depth = segNames(scheme).size
    // Spark's own hidden-path rule: '_'/'.'-prefixed names are metadata
    // UNLESS they contain '=' (partition directories like `_p0=2017`)
    def isData(name: String): Boolean =
      name.contains("=") || (!name.startsWith("_") && !name.startsWith("."))
    def dataFiles(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(dir).toSeq.collect {
        case s if s.isFile && isData(s.getPath.getName) => s.getPath
      }
    def walk(dir: org.apache.hadoop.fs.Path, rel: String, levels: Int): Seq[(String, Seq[org.apache.hadoop.fs.Path])] = {
      if (levels == 0) {
        val files = dataFiles(dir)
        if (files.isEmpty) Nil else Seq(rel -> files)
      } else {
        fs.listStatus(dir).toSeq.collect {
          case s if s.isDirectory && isData(s.getPath.getName) =>
            val name = s.getPath.getName
            walk(s.getPath, if (rel.isEmpty) name else s"$rel/$name", levels - 1)
        }.flatten
      }
    }
    if (!fs.exists(root)) Map.empty else walk(root, "", depth).toMap
  }

  /**
   * Compact partitions — `MetadataFileSystemStorage.compact(partition)`
   * re-expressed as ONE distributed Spark job over every flagged
   * partition instead of the reference's per-partition local rewrite
   * (FileSystemCompactionJob is its MapReduce equivalent): read only the
   * flagged directories, shuffle once on the partition columns so each
   * directory is rewritten by a single task into a single file
   * (`maxRecordsPerFile` > 0 re-splits oversized outputs at write time,
   * deterministically), then swap files in place — new files move in
   * before old files delete, so a concurrent reader sees duplicates
   * briefly, never a gap (the same trade the reference makes).
   *
   * `partitions` narrows the job (default: every partition with more
   * than one file). `retain` drops rows failing the predicate during
   * the rewrite — the age-off-on-compaction pattern (the reference ages
   * data off in its Accumulo compaction iterator, age-off docs /
   * DtgAgeOffTest); a partition whose rows all expire is deleted.
   *
   * Returns the relative paths of the partitions compacted.
   */
  def compact(spark: SparkSession, path: String, scheme: PartitionScheme,
              format: String = "parquet",
              partitions: Option[Seq[String]] = None,
              retain: Option[Column] = None,
              maxRecordsPerFile: Long = 0L): Seq[String] = {
    requireFormat(format)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // finish any swap a crashed compaction left behind BEFORE listing —
    // its journal is the redo log; without this a re-run would read the
    // duplicated old+new files together and bake the duplicates in
    healCompactions(fs, root)
    val names = segNames(scheme)
    val all = partitionFiles(spark, path, scheme)
    val flagged = partitions match {
      case Some(ps) =>
        val missing = ps.filterNot(all.contains)
        require(missing.isEmpty, s"unknown partitions: ${missing.mkString(", ")}")
        ps.distinct
      case None =>
        // age-off must visit single-file partitions too
        if (retain.isDefined) all.keys.toSeq.sorted
        else all.collect { case (rel, files) if files.size > 1 => rel }.toSeq.sorted
    }
    if (flagged.isEmpty) return Nil

    // read EXACTLY the files listed above, not their directories: a file
    // landed by a concurrent append between the listing and the scan is
    // then neither rewritten nor deleted — it simply survives the
    // compaction, instead of being double-counted (rows compacted in AND
    // the original file never removed)
    val inputs = flagged.flatMap(all(_)).map(_.toString)
    val df0 = withPartitionInferenceOff(spark) {
      spark.read.format(format).option("basePath", path).load(inputs: _*)
    }
    val df1 = retain.fold(df0)(df0.where)
    val shuffled =
      if (names.isEmpty) df1.coalesce(1)
      else df1.repartition(flagged.size, names.map(col): _*)
    val tmp = new org.apache.hadoop.fs.Path(root, s".compact-${java.util.UUID.randomUUID}")
    try {
      val w0 = shuffled.write.mode("overwrite").format(format)
      val w1 = if (names.isEmpty) w0 else w0.partitionBy(names: _*)
      val w2 = if (maxRecordsPerFile > 0) w1.option("maxRecordsPerFile", maxRecordsPerFile) else w1
      w2.save(tmp.toString)
    } catch { case e: Throwable => fs.delete(tmp, true); throw e }

    // write-ahead journal, committed atomically via rename: the swap
    // below (rename new files in, delete old files, drop fully-expired
    // dirs) is re-playable from it, so a crash or failed rename mid-swap
    // is healed by the next compact() instead of leaving permanent
    // duplicate rows. Old files are listed explicitly; remaining new
    // files are whatever is still under tmp at replay time (renames
    // already applied have left it).
    val deletes = flagged.flatMap(all(_))
    val dropDirs = flagged.filter { rel =>
      rel.nonEmpty && !fs.exists(new org.apache.hadoop.fs.Path(tmp, rel))
    }
    val journal = writeJournal(fs, root, tmp, flagged, deletes, dropDirs)
    applySwap(fs, root, tmp, flagged, deletes, dropDirs, journal)
    flagged
  }

  private val JournalPrefix = ".compact-journal-"

  private def writeJournal(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path,
                           tmp: org.apache.hadoop.fs.Path,
                           flagged: Seq[String],
                           deletes: Seq[org.apache.hadoop.fs.Path],
                           dropDirs: Seq[String]): org.apache.hadoop.fs.Path = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("tmp", tmp.getName)
    val pn = node.putArray("partitions"); flagged.foreach(pn.add)
    val dn = node.putArray("deletes"); deletes.foreach(p => dn.add(p.toString))
    val xn = node.putArray("dropDirs"); dropDirs.foreach(xn.add)
    val id = java.util.UUID.randomUUID.toString
    val staged = new org.apache.hadoop.fs.Path(root, s"$JournalPrefix$id.tmp")
    val committed = new org.apache.hadoop.fs.Path(root, s"$JournalPrefix$id.json")
    val out = fs.create(staged, true)
    try out.write(mapper.writeValueAsString(node).getBytes("UTF-8")) finally out.close()
    require(fs.rename(staged, committed), s"journal commit failed: $committed")
    committed
  }

  /** Replay/perform the swap: move tmp's data files into their target
    * partition dirs, delete the journaled old files, drop fully-expired
    * partition dirs, then remove tmp and the journal. Every step is
    * idempotent (exists-guarded), so a partial run replays cleanly. */
  private def applySwap(fs: org.apache.hadoop.fs.FileSystem,
                        root: org.apache.hadoop.fs.Path,
                        tmp: org.apache.hadoop.fs.Path,
                        flagged: Seq[String],
                        deletes: Seq[org.apache.hadoop.fs.Path],
                        dropDirs: Seq[String],
                        journal: org.apache.hadoop.fs.Path): Unit = {
    flagged.foreach { rel =>
      val oldDir = if (rel.isEmpty) root else new org.apache.hadoop.fs.Path(root, rel)
      val newDir = if (rel.isEmpty) tmp else new org.apache.hadoop.fs.Path(tmp, rel)
      if (fs.exists(newDir)) {
        val newFiles = fs.listStatus(newDir).toSeq.collect {
          case s if s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith(".") => s.getPath
        }
        newFiles.foreach { f =>
          val target = new org.apache.hadoop.fs.Path(oldDir, f.getName)
          require(fs.exists(target) || fs.rename(f, target),
            s"rename failed: $f -> $oldDir")
        }
      }
    }
    deletes.foreach(p => if (fs.exists(p)) fs.delete(p, false))
    dropDirs.foreach { rel =>
      val d = new org.apache.hadoop.fs.Path(root, rel)
      if (fs.exists(d)) fs.delete(d, true)
    }
    fs.delete(tmp, true)
    fs.delete(journal, false)
  }

  /** Redo crashed swaps from their journals (and sweep uncommitted
    * `.tmp` journals + their orphaned tmp dirs — those crashed BEFORE
    * the journal committed, so the old files are untouched and the
    * half-written output is garbage). */
  private def healCompactions(fs: org.apache.hadoop.fs.FileSystem,
                              root: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(JournalPrefix))
    entries.foreach { j =>
      if (j.getName.endsWith(".tmp")) fs.delete(j, false)
      else {
        val in = fs.open(j)
        val text = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
        val tmp = new org.apache.hadoop.fs.Path(root, n.get("tmp").asText())
        def strs(field: String): Seq[String] = {
          val it = n.get(field).elements(); val b = Seq.newBuilder[String]
          while (it.hasNext) b += it.next().asText()
          b.result()
        }
        applySwap(fs, root, tmp, strs("partitions"),
          strs("deletes").map(new org.apache.hadoop.fs.Path(_)), strs("dropDirs"), j)
      }
    }
  }

  /** Read back with partition pruning driven by the scheme cover: each
    * level whose cover is enumerable becomes an `isin` over that
    * partition column (evaluated against partition VALUES at planning
    * time — only covered directories are listed into the scan); levels
    * the filter cannot bound just skip pruning. The CQL predicate is
    * applied in full regardless, so pruning is purely an I/O bound. */
  def read(spark: SparkSession, path: String, scheme: PartitionScheme,
           cql: Option[String] = None, props: Map[String, Column] = Map.empty,
           format: String = "parquet"): DataFrame = {
    requireUtc(spark)
    requireFormat(format)
    val names = segNames(scheme)
    // partition columns must come back as the STRINGS we wrote ("003"
    // must not become int 3); inference is consulted when the relation
    // resolves its schema, i.e. inside this read — restore after
    val df = withPartitionInferenceOff(spark)(spark.read.format(format).load(path))
    cql match {
      case None => df.drop(names: _*)
      case Some(q) =>
        val pred = Cql.parse(q, props)
        val conjuncts = splitConjuncts(expressionOf(pred)).map(unalias(_, props))
        val pruned = levelCovers(scheme, conjuncts).zip(names).foldLeft(df) {
          case (d, (Some(values), n)) if values.size <= MaxCover =>
            d.where(col(n).isin(values.toSeq: _*))
          case (d, _) => d
        }
        pruned.where(pred).drop(names: _*)
    }
  }

  /** Disable partition-column type inference for the duration of `body`
    * (which must eagerly resolve its relation), restoring the prior
    * session value. Shared by [[read]] and [[SpatialTable.readAll]]. */
  private[table] def withPartitionInferenceOff[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Rewrite props-mapped expressions back to their attribute names so
    * the cover extractors see `dtg`/`geom` rather than the derived
    * expression. A lon/lat table maps geom -> st_makePoint(lon, lat)
    * (the documented props usage); without this rewrite the z2 level
    * would silently skip pruning — results stay correct (the predicate
    * re-applies) but the scan reads every spatial partition. Matching is
    * structural on the unresolved trees: Cql compiled the predicate from
    * these very Column objects, so the subtrees are identical. */
  private[table] def unalias(e: Expression, props: Map[String, Column]): Expression = {
    if (props.isEmpty) e
    else {
      val alts = props.map { case (n, c) => expressionOf(c).toString -> n }
      e.transform {
        case x if alts.contains(x.toString) => UnresolvedAttribute(alts(x.toString))
      }
    }
  }

  /** Per-level distinct segment values from each sub-scheme's cover
    * (None at a level = skip pruning there). */
  private[table] def levelCovers(scheme: PartitionScheme,
                                 conjuncts: Seq[Expression]): Seq[Option[Set[String]]] = scheme match {
    case c: CompositeScheme => c.schemes.flatMap(levelCovers(_, conjuncts))
    case s =>
      val n = maxSegments(s)
      if (n == 0) Nil
      else s.cover(conjuncts) match {
        case None => Seq.fill(n)(None)
        case Some(parts) =>
          val split = parts.map(_.split('/'))
          (0 until n).map(i => Some(split.map(a => if (i < a.length) a(i) else "").toSet))
      }
  }

  // ---- filter extraction ----------------------------------------------

  /** Column -> Catalyst Expression. Spark 4 moved `Column.expr` behind
    * the classic ColumnNode converter (`org.apache.spark.sql.classic
    * .ColumnNodeToExpressionConverter`, private[sql] in Scala but
    * public in bytecode) — the same eager conversion every Filter plan
    * goes through, so udfName-carrying ScalaUDFs survive intact. */
  private[table] lazy val expressionOf: Column => Expression = {
    val clazz = Class.forName("org.apache.spark.sql.classic.ColumnNodeToExpressionConverter$")
    val mod = clazz.getField("MODULE$").get(null)
    val m = clazz.getMethods.find(x => x.getName == "apply" &&
      x.getParameterTypes.headOption.exists(_.getName.endsWith("ColumnNode"))).get
    c => m.invoke(mod, c.node).asInstanceOf[Expression]
  }

  /** Pre-analysis trees spell operators as UnresolvedFunction("and"),
    * UnresolvedFunction(">="), ...; analyzed trees as And/GreaterThan.
    * Normalize both to (opName, args). */
  private object Op {
    def unapply(e: Expression): Option[(String, Seq[Expression])] = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        Some((f.nameParts.last.toLowerCase, f.arguments))
      case And(a, b) => Some(("and", Seq(a, b)))
      case GreaterThan(a, b) => Some((">", Seq(a, b)))
      case GreaterThanOrEqual(a, b) => Some((">=", Seq(a, b)))
      case LessThan(a, b) => Some(("<", Seq(a, b)))
      case LessThanOrEqual(a, b) => Some(("<=", Seq(a, b)))
      case EqualTo(a, b) => Some(("=", Seq(a, b)))
      case _ => None
    }
  }

  private[table] def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case Op("and", Seq(a, b)) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case a: AttributeReference => Some(a.name)
    case Cast(c, _, _, _) => attrName(c)
    case _ => None
  }

  private def litInstant(e: Expression): Option[Instant] = {
    if (!e.foldable) None
    else try {
      (e.dataType, e.eval(null)) match {
        case (_, null) => None
        case (TimestampType, micros: java.lang.Long) =>
          Some(Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L))
        case (DateType, days: java.lang.Integer) =>
          Some(Instant.EPOCH.plus(days.toLong, ChronoUnit.DAYS))
        case (StringType, s) => Some(Cql.parseInstant(s.toString))
        case _ => None
      }
    } catch { case NonFatal(_) => None }
  }

  /** Intersected [lo, hi] time bounds on `field` across the conjuncts —
    * the reference's FilterHelper.extractIntervals with
    * handleExclusiveBounds = true (exclusive endpoints move one second
    * inward before formatting at the partition granularity). None when
    * either side is unbounded. */
  private[table] def timeBounds(conjuncts: Seq[Expression],
                                field: String): Option[(ZonedDateTime, ZonedDateTime)] = {
    var lo: Option[Instant] = None
    var hi: Option[Instant] = None
    def tightenLo(i: Instant): Unit = if (lo.forall(_.isBefore(i))) lo = Some(i)
    def tightenHi(i: Instant): Unit = if (hi.forall(_.isAfter(i))) hi = Some(i)
    def matches(a: Expression): Boolean = attrName(a).exists(_.equalsIgnoreCase(field))

    // (op, attr-side, literal-side, attrOnLeft) — both operand orders
    def bound(op: String, lhsAttr: Boolean, i: Instant): Unit = (op, lhsAttr) match {
      case (">", true) | ("<", false) => tightenLo(i.plusSeconds(1))
      case ((">=", true) | ("<=", false)) => tightenLo(i)
      case (("<", true) | (">", false)) => tightenHi(i.minusSeconds(1))
      case (("<=", true) | (">=", false)) => tightenHi(i)
      case (("=" | "==", _)) => tightenLo(i); tightenHi(i)
      case _ =>
    }
    conjuncts.foreach {
      case Op(op, Seq(a, b)) if matches(a) => litInstant(b).foreach(bound(op, lhsAttr = true, _))
      case Op(op, Seq(b, a)) if matches(a) => litInstant(b).foreach(bound(op, lhsAttr = false, _))
      case _ =>
    }
    for (l <- lo; h <- hi)
      yield (l.atZone(ZoneOffset.UTC), h.atZone(ZoneOffset.UTC))
  }

  /** Intersected spatial envelope on `field` across the conjuncts —
    * the reference's FilterHelper.extractGeometries(intersect = true)
    * reduced to bounds (Z2Scheme.scala:41-54). Whole world when nothing
    * constrains the field; None when the intersection is empty. */
  private[table] def envelopeOf(conjuncts: Seq[Expression], field: String): Option[Envelope] = {
    val world = new Envelope(-180.0, 180.0, -90.0, 90.0)
    var env = world
    var empty = false

    def refers(e: Expression): Boolean = e match {
      case u: UnresolvedAttribute => u.nameParts.last.equalsIgnoreCase(field)
      case a: AttributeReference => a.name.equalsIgnoreCase(field)
      case other => other.children.exists(refers)
    }
    def intersect(q: Envelope): Unit = {
      val i = env.intersection(q)
      if (i.isNull) empty = true else env = i
    }

    conjuncts.foreach {
      case s: ScalaUDF if s.children.size == 2 &&
          s.udfName.exists(n => SpatialFilterRule.Pushable(n.toLowerCase)) =>
        val Seq(a, b) = s.children
        (SpatialFilterRule.constEnvelope(a), SpatialFilterRule.constEnvelope(b)) match {
          case (Some(q), None) if refers(b) => intersect(q)
          case (None, Some(q)) if refers(a) => intersect(q)
          case _ =>
        }
      case _ =>
    }
    if (empty) None else Some(env)
  }
}
