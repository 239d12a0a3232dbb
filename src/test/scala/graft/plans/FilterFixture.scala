package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Geometry, GeometryFactory}
import org.locationtech.jts.io.WKTReader

import graft.functions.StFunctions
import graft.table.SpatialTable

/**
 * The shared dual-evaluator harness behind FilterCorpusParitySpec and
 * FilterFuzzSpec: the reference's seeded mediumData fixture
 * (iterators/TestData.scala:164-200), an INDEPENDENT in-memory
 * recursive-descent CQL evaluator (JTS predicates + java.time — shares
 * no code with plans/Cql), and the three engine evaluation routes
 * (mixed DataFrame filter, batched predicate Column, indexed scan).
 */
final class FilterFixture {

  lazy val spark: org.apache.spark.sql.SparkSession = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-filter-fixture")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    StFunctions.register(s)
    s
  }

  case class Feat(fid: String, attr2: String, geom: Geometry, millis: Long)

  /** TestData.mediumData: Random(0), 1000 points in [40,50]x[20,30] over
    * Jun-Aug 2010, plus one line + one triangle per 3-point group for the
    * first 20 groups (TestData.scala:166-200; ids are STRING-concatenated
    * with 1000000/2000000 exactly like the reference's `headEntry.id+1000000`). */
  lazy val feats: Seq[Feat] = {
    val rng = new scala.util.Random(0)
    val minTime = java.time.ZonedDateTime.of(2010, 6, 1, 0, 0, 0, 0, java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli
    val maxTime = java.time.ZonedDateTime.of(2010, 8, 31, 23, 59, 59, 999000000, java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli
    val reader = new WKTReader()
    val pts = (1 to 1000).map { i =>
      val wkt = "POINT(" +
        (40.0 + 10.0 * rng.nextDouble()).toString + " " +
        (20.0 + 10.0 * rng.nextDouble()).toString + " " +
        ")"
      val dt = math.round(minTime + (maxTime - minTime) * rng.nextDouble())
      val id = (100000 + i).toString
      Feat(id, "2nd" + id, reader.read(wkt), dt)
    }.toList
    val gf = new GeometryFactory()
    val linesPolys = pts.grouped(3).take(1000 / 50).flatMap { three =>
      val head = three.head
      val coords = three.map(_.geom.getCoordinate)
      val line = gf.createLineString(coords.toArray)
      val poly = gf.createPolygon((coords :+ coords.head).toArray)
      val lid = head.fid + 1000000
      val pid = head.fid + 2000000
      Seq(Feat(lid, "2nd" + lid, line, head.millis),
          Feat(pid, "2nd" + pid, poly, head.millis))
    }
    pts ++ linesPolys
  }

  lazy val mixedDf: org.apache.spark.sql.DataFrame = {
    StFunctions.register(spark)
    import spark.implicits._
    feats.map(f => (f.fid, f.attr2, f.geom.toText,
        new java.sql.Timestamp(f.millis), new java.sql.Timestamp(f.millis)))
      .toDF("fid", "attr2", "wkt", "dtg", "dtg_end_time")
      .withColumn("geom", expr("st_geomFromWKT(wkt)"))
      .cache()
  }

  lazy val pointFeats: Seq[Feat] = feats.filter(_.geom.getGeometryType == "Point")

  lazy val tableRoot: String = {
    StFunctions.register(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_filtercorpus").toString
    val df = pointFeats.map { f =>
      (f.fid, f.attr2, f.geom.getCoordinate.x, f.geom.getCoordinate.y,
        new java.sql.Timestamp(f.millis), new java.sql.Timestamp(f.millis))
    }.toDF("fid", "attr2", "lon", "lat", "dtg", "dtg_end_time")
    SpatialTable.write(spark, df, dir, "s1", "fid", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4)
    dir
  }

  // ---- the independent in-memory evaluator (the `filter.evaluate` side) ----

  /** Recursive-descent evaluator for the corpus grammar, evaluating
    * per-feature with JTS predicates and java.time instants. GeoTools
    * semantics mirrored directly: BBOX = intersects with the envelope
    * polygon; BETWEEN inclusive; DURING/AFTER/BEFORE strict; ILIKE
    * case-insensitive %/_ wildcards; bare IN(...) = feature-id set. */
  object Eval {
    private val gf = new GeometryFactory()
    private val reader = new WKTReader()
    private val spatialOps = Set("INTERSECTS", "OVERLAPS", "WITHIN", "CONTAINS",
      "CROSSES", "DISJOINT", "TOUCHES", "EQUALS")

    def apply(cql: String): Feat => Boolean = new P(cql).parseOr()

    private final class P(s: String) {
      private var i = 0
      private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      private def peekWord(): String = {
        ws()
        var j = i
        while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_' ||
          s.charAt(j) == ':' || s.charAt(j) == '.' || s.charAt(j) == '-' ||
          s.charAt(j) == '+')) j += 1
        s.substring(i, j)
      }
      private def word(): String = { val w = peekWord(); i += w.length; w }
      private def expect(c: Char): Unit = { ws(); require(i < s.length && s.charAt(i) == c, s"expected $c at $i in $s"); i += 1 }
      private def accept(c: Char): Boolean = { ws(); if (i < s.length && s.charAt(i) == c) { i += 1; true } else false }
      private def str(): String = {
        ws(); expect('\'')
        val j = s.indexOf('\'', i)
        val v = s.substring(i, j); i = j + 1; v
      }
      private def num(): Double = { val w = word(); w.toDouble }

      def parseOr(): Feat => Boolean = {
        var l = parseAnd()
        while (peekWord().equalsIgnoreCase("OR")) { word(); val r = parseAnd(); val ll = l; l = f => ll(f) || r(f) }
        l
      }
      private def parseAnd(): Feat => Boolean = {
        var l = parseUnary()
        while (peekWord().equalsIgnoreCase("AND")) { word(); val r = parseUnary(); val ll = l; l = f => ll(f) && r(f) }
        l
      }
      private def parseUnary(): Feat => Boolean = {
        ws()
        if (peekWord().equalsIgnoreCase("NOT")) { word(); val inner = parseUnary(); f => !inner(f) }
        else if (i < s.length && s.charAt(i) == '(') { expect('('); val inner = parseOr(); expect(')'); inner }
        else parsePrimary()
      }
      private def wktLiteral(): Geometry = {
        ws()
        val start = i
        word() // keyword
        ws(); var depth = 0
        do {
          val c = s.charAt(i)
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          i += 1
        } while (depth > 0)
        reader.read(s.substring(start, i))
      }
      private def instant(tok: String): java.time.Instant = {
        val t = if (tok.endsWith("Z") || tok.contains("+")) tok else tok + "Z"
        java.time.OffsetDateTime.parse(t).toInstant
      }
      private def parsePrimary(): Feat => Boolean = {
        val w0 = peekWord()
        val up = w0.toUpperCase
        if (up == "BBOX") {
          word(); expect('('); word(); expect(',')
          val x1 = num(); expect(','); val y1 = num(); expect(',')
          val x2 = num(); expect(','); val y2 = num(); expect(')')
          val env = gf.toGeometry(new org.locationtech.jts.geom.Envelope(x1, x2, y1, y2))
          f => f.geom.intersects(env)
        } else if (spatialOps.contains(up)) {
          word(); expect('('); word(); expect(',')
          val lit = wktLiteral(); expect(')')
          up match {
            case "INTERSECTS" => f => f.geom.intersects(lit)
            case "DISJOINT"   => f => f.geom.disjoint(lit)
            case "OVERLAPS"   => f => f.geom.overlaps(lit)
            case "WITHIN"     => f => f.geom.within(lit)
            case "CONTAINS"   => f => f.geom.contains(lit)
            case "CROSSES"    => f => f.geom.crosses(lit)
            case "TOUCHES"    => f => f.geom.touches(lit)
            case "EQUALS"     => f => f.geom.equals(lit)
          }
        } else if (up == "IN") {
          word(); expect('(')
          val ids = scala.collection.mutable.Set(str())
          while (accept(',')) ids += str()
          expect(')')
          f => ids.contains(f.fid)
        } else {
          // property-led predicate
          val prop = word()
          val local = prop.substring(prop.lastIndexOf(':') + 1)
          def timeOf(f: Feat): java.time.Instant = java.time.Instant.ofEpochMilli(f.millis)
          val opw = peekWord()
          if (opw.equalsIgnoreCase("BETWEEN")) {
            word()
            val lo = instant(str()); require(word().equalsIgnoreCase("AND"), "BETWEEN..AND")
            val hi = instant(str())
            f => !timeOf(f).isBefore(lo) && !timeOf(f).isAfter(hi)
          } else if (opw.equalsIgnoreCase("DURING")) {
            word()
            val lo = instant(word()); expect('/'); val hi = instant(word())
            f => timeOf(f).isAfter(lo) && timeOf(f).isBefore(hi)
          } else if (opw.equalsIgnoreCase("AFTER")) {
            word(); val t = instant(word()); f => timeOf(f).isAfter(t)
          } else if (opw.equalsIgnoreCase("BEFORE")) {
            word(); val t = instant(word()); f => timeOf(f).isBefore(t)
          } else if (opw.equalsIgnoreCase("ILIKE")) {
            word()
            val pat = str()
            val rx = ("(?is)^" + pat.flatMap {
              case '%' => ".*"
              case '_' => "."
              case c => java.util.regex.Pattern.quote(c.toString)
            } + "$").r
            require(local == "attr2", s"unexpected ILIKE property $local")
            f => rx.findFirstIn(f.attr2).isDefined
          } else if (accept('=')) {
            val v = str()
            require(local == "attr2", s"unexpected = property $local")
            f => f.attr2 == v
          } else sys.error(s"unparsed predicate at $i in $s")
        }
      }
    }
  }

  // ---- the evaluation routes ---------------------------------------------

  def evalCount(cql: String, fs: Seq[Feat]): Long = {
    val p = Eval(cql)
    fs.count(p).toLong
  }

  def evalCount(cql: String): Long = evalCount(cql, feats)

  def evalPointCount(cql: String): Long = evalCount(cql, pointFeats)

  /** The engine's compiled predicate over [[mixedDf]] — lets a caller
    * evaluate MANY filters in one aggregate pass. */
  def predicate(cql: String): Column =
    Cql.parse(cql, Map("geom" -> col("geom")), "fid", Cql.arrayProps(mixedDf))

  def mixedCount(cql: String): Long =
    Cql.filter(mixedDf, cql, props = Map("geom" -> col("geom")), idColumn = "fid").count()

  def indexedCount(cql: String): Long =
    SpatialTable.queryCql(spark, tableRoot, "s1", cql, idColumn = "fid").count()
}
