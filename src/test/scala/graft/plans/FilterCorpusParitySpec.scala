package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.StFunctions
import graft.table.SpatialTable
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.io.WKTReader

/**
 * Port of the reference's filter corpus differential suite
 * (/root/reference/geomesa-accumulo/geomesa-accumulo-datastore/src/test/
 * scala/.../filter/FilterTest.scala:44-106 over TestFilters.scala and
 * the seeded TestData.mediumData fixture, iterators/TestData.scala:
 * 164-200): ~80 ECQL filters, each evaluated two independent ways and
 * asserted to agree —
 *
 *  1. the ENGINE path: plans/Cql compiles the string to one Catalyst
 *     predicate evaluated distributed (and, for the point subset, the
 *     full indexed path through SpatialTable.queryCql with the
 *     SpatialFilterRule extension installed, i.e. pushdown + cell
 *     ranges + refine);
 *  2. an in-memory per-feature evaluator written directly against JTS
 *     and java.time in this spec (the analog of the reference's
 *     GeoTools `filter.evaluate` side), sharing no code with plans/Cql.
 *
 * The reference's DWITHIN set is `pendingUntilFixed` there (geotools
 * disagreement) and is skipped here for the same reason. The id
 * predicates use the reference's literal '|data|...' ids (which match
 * nothing — the AND-intersection zero cases are part of the fixture)
 * plus the same shapes over this store's real ids.
 */
class FilterCorpusParitySpec extends AnyFunSuite {

  private lazy val spark: org.apache.spark.sql.SparkSession = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-filter-corpus-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    StFunctions.register(s)
    s
  }

  private case class Feat(fid: String, attr2: String, geom: Geometry, millis: Long)

  /** TestData.mediumData: Random(0), 1000 points in [40,50]x[20,30] over
    * Jun-Aug 2010, plus one line + one triangle per 3-point group for the
    * first 20 groups (TestData.scala:166-200; ids are STRING-concatenated
    * with 1000000/2000000 exactly like the reference's `headEntry.id+1000000`). */
  private lazy val feats: Seq[Feat] = {
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

  private lazy val mixedDf = {
    StFunctions.register(spark)
    import spark.implicits._
    feats.map(f => (f.fid, f.attr2, f.geom.toText,
        new java.sql.Timestamp(f.millis), new java.sql.Timestamp(f.millis)))
      .toDF("fid", "attr2", "wkt", "dtg", "dtg_end_time")
      .withColumn("geom", expr("st_geomFromWKT(wkt)"))
      .cache()
  }

  private lazy val pointFeats = feats.filter(_.geom.getGeometryType == "Point")

  private lazy val tableRoot: String = {
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
  private object Eval {
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

  // ---- the corpus (TestFilters.scala, the sets FilterTest runs) ----------

  private val goodSpatialPredicates = Seq(
    "INTERSECTS(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))",
    "OVERLAPS(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))",
    "WITHIN(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))",
    "CONTAINS(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))",
    "CONTAINS(geom, POINT (45 23))",
    "CROSSES(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))",
    "BBOX(geom, 45, 23, 48, 27)")

  private def pairwise(op: String): Seq[String] = {
    val preds = Seq("INTERSECTS", "OVERLAPS", "WITHIN", "DISJOINT", "CROSSES")
    val a = "POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28))"
    val b = "POLYGON ((44 23, 46 23, 46 25, 44 25, 44 23))"
    for (p1 <- preds; p2 <- preds if p1 != p2) yield s"$p1(geom, $a) $op $p2(geom, $b)"
  }
  private val andedSpatialPredicates = pairwise("AND")
  private val oredSpatialPredicates = pairwise("OR")

  private val temporalPredicates = Seq(
    "(not dtg after 2010-08-08T23:59:59Z) and (not dtg_end_time before 2010-08-08T00:00:00Z)",
    "(dtg between '2010-08-08T00:00:00.000Z' AND '2010-08-08T23:59:59.000Z')",
    "dtg DURING 2010-08-08T00:00:00.000Z/2010-08-08T23:59:59.000Z")

  private val spatioTemporalPredicates = Seq(
    "INTERSECTS(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23))) AND dtg DURING 2010-08-08T00:00:00.000Z/2010-08-08T23:59:59.000Z")

  private val spatioTemporalPredicatesWithNS = Seq(
    "INTERSECTS(ns:geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23))) AND dtg DURING 2010-08-08T00:00:00.000Z/2010-08-08T23:59:59.000Z",
    "INTERSECTS(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23))) AND ns:dtg DURING 2010-08-08T00:00:00.000Z/2010-08-08T23:59:59.000Z",
    "INTERSECTS(ns:geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23))) AND ns:dtg DURING 2010-08-08T00:00:00.000Z/2010-08-08T23:59:59.000Z")

  private val attributePredicates = Seq(
    "attr2 = '2nd100001'",
    "attr2 ILIKE '%1'",
    "attr2 ILIKE '2nd1%'",
    "attr2 ILIKE '1%'")

  private val attributeAndGeometricPredicates = Seq(
    "attr2 = '2nd100001' AND INTERSECTS(geom, POLYGON ((45 20, 48 20, 48 27, 45 27, 45 20)))",
    "attr2 = '2nd100001' AND INTERSECTS(geom, POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28)))",
    "attr2 ILIKE '2nd1%' AND CROSSES(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))",
    "attr2 ILIKE '2nd1%' AND INTERSECTS(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))",
    "attr2 ILIKE '2nd1%' AND OVERLAPS(geom, POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28)))",
    "attr2 ILIKE '2nd1%' AND WITHIN(geom, POLYGON ((45 23, 48 23, 48 27, 45 27, 45 23)))")

  private val attributeAndGeometricPredicatesWithNS = attributeAndGeometricPredicates.map(
    _.replace("(geom,", "(ns:geom,"))

  private val idPredicates = Seq(
    "IN('|data|100001','|data|100002')",
    "IN('|data|100003','|data|100005') AND IN('|data|100001')",
    "IN('|data|100001','|data|100002') AND attr2 = '2nd100001'",
    "IN('|data|100001','|data|100002') AND attr2 = '2nd100001' AND IN('|data|100003','|data|100005')",
    "attr2 = '2nd100001'  AND IN('|data|100001')",
    "IN('|data|100010')",
    "dtg DURING 2010-06-01T00:00:00.000Z/2010-08-31T23:59:59.000Z AND IN('|data|100001')",
    "IN('|data|100001') AND dtg DURING 2010-06-01T00:00:00.000Z/2010-08-31T23:59:59.000Z ",
    "WITHIN(geom, POLYGON ((40 20, 50 20, 50 30, 40 30, 40 20))) AND IN('|data|100001')",
    "IN('|data|100001') AND WITHIN(geom, POLYGON ((40 20, 50 20, 50 30, 40 30, 40 20)))",
    "dtg DURING 2010-06-01T00:00:00.000Z/2010-08-31T23:59:59.000Z AND IN('|data|100001','|data|100002')" +
      "AND WITHIN(geom, POLYGON ((40 20, 50 20, 50 30, 40 30, 40 20))) AND attr2 = '2nd100001'")

  // the same shapes over ids that exist in this fixture (non-zero hits)
  private val realIdPredicates = idPredicates.map(_.replace("|data|", ""))

  // ---- the differentials --------------------------------------------------

  private def evalCount(cql: String, fs: Seq[Feat]): Long = {
    val p = Eval(cql)
    fs.count(p).toLong
  }

  private def mixedCount(cql: String): Long =
    Cql.filter(mixedDf, cql, props = Map("geom" -> col("geom")), idColumn = "fid").count()

  private def indexedCount(cql: String): Long =
    SpatialTable.queryCql(spark, tableRoot, "s1", cql, idColumn = "fid").count()

  private def runMixed(name: String, filters: Seq[String]): Unit = test(
    s"$name: engine == in-memory over the mixed fixture (FilterTest corpus)") {
    filters.foreach { f =>
      assert(mixedCount(f) == evalCount(f, feats), s"filter: $f")
    }
  }

  runMixed("goodSpatialPredicates", goodSpatialPredicates)
  runMixed("andedSpatialPredicates", andedSpatialPredicates)
  runMixed("oredSpatialPredicates", oredSpatialPredicates)
  runMixed("temporalPredicates", temporalPredicates)
  runMixed("spatioTemporalPredicates", spatioTemporalPredicates)
  runMixed("spatioTemporalPredicatesWithNS", spatioTemporalPredicatesWithNS)
  runMixed("attributePredicates", attributePredicates)
  runMixed("attributeAndGeometricPredicates", attributeAndGeometricPredicates)
  runMixed("attributeAndGeometricPredicatesWithNS", attributeAndGeometricPredicatesWithNS)
  runMixed("idPredicates", idPredicates)
  runMixed("realIdPredicates", realIdPredicates)

  test("the corpus actually hits the fixture (reference's mediumData expectations)") {
    // the 45..48 x 23..27 polygon covers ~15% of the 40..50 x 20..30 box
    assert(evalCount(goodSpatialPredicates.head, feats) > 50)
    assert(evalCount("attr2 = '2nd100001'", feats) == 1)
    assert(evalCount("attr2 ILIKE '2nd1%'", feats) > 900)
    assert(evalCount("attr2 ILIKE '1%'", feats) == 0)
    assert(evalCount(realIdPredicates.head, feats) == 2)
  }

  test("projection variant keeps counts (FilterTest 'OR geom predicates with projections')") {
    oredSpatialPredicates.take(4).foreach { f =>
      val c = Cql.filter(mixedDf, f, props = Map("geom" -> col("geom")), idColumn = "fid")
        .select("geom").count()
      assert(c == evalCount(f, feats), s"filter: $f")
    }
  }

  test("indexed scan == in-memory over the point subset (pushdown differential)") {
    val filters = goodSpatialPredicates ++ temporalPredicates ++
      spatioTemporalPredicates ++ spatioTemporalPredicatesWithNS ++
      attributeAndGeometricPredicates.take(3) ++ idPredicates.take(4) ++ realIdPredicates.take(6)
    filters.foreach { f =>
      assert(indexedCount(f) == evalCount(f, pointFeats), s"filter: $f")
    }
  }

  // ---- IdQueryTest (FilterTest.scala:108-156) ------------------------------

  test("id queries over the id index (IdQueryTest port)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_idquery").toString
    val df = Seq(
      ("1", 10, "johndoe", 10.0, 10.0),
      ("2", 20, "janedoe", 20.0, 20.0),
      ("3", 30, "johnrdoe", 20.0, 20.0)
    ).toDF("fid", "age", "name", "lon", "lat")
      .withColumn("dtg", current_timestamp())
    SpatialTable.write(spark, df, dir, "s1", "fid", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 2)
    SpatialTable.writeIdIndex(spark, dir, "s1", "fid")

    val one = SpatialTable.readByIds(spark, dir, "s1", "fid", Seq("2"))
      .select("fid").as[String].collect().toSeq
    assert(one == Seq("2"))

    val two = SpatialTable.readByIds(spark, dir, "s1", "fid", Seq("1", "3"))
      .select("fid").as[String].collect().toSet
    assert(two == Set("1", "3"))

    // ANDed id sets with no intersection return nothing
    val none = SpatialTable.queryCql(spark, dir, "s1",
      "IN('1','3') AND IN('2')", idColumn = "fid")
    assert(none.count() == 0)
  }
}
