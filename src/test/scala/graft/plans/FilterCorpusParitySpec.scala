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

  // fixture + independent evaluator shared with FilterFuzzSpec
  private val fx = new FilterFixture
  import fx.{spark, Feat}

  private lazy val feats: Seq[Feat] = fx.feats
  private lazy val mixedDf = fx.mixedDf
  private lazy val pointFeats = fx.pointFeats

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

  private def evalCount(cql: String, fs: Seq[Feat]): Long = fx.evalCount(cql, fs)

  private def mixedCount(cql: String): Long = fx.mixedCount(cql)

  private def indexedCount(cql: String): Long = fx.indexedCount(cql)

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
