package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.functions.StFunctions
import graft.table.SpatialTable
import graft.plans.StrategyDecider._

/**
 * StrategyDecider parity (reference StrategyDecider.scala:47-63 +
 * the static costs in the index/strategies FilterStrategy classes): the
 * cheapest eligible index wins, the rest of the filter becomes the
 * residual, and the routed scan returns exactly what the full primary
 * scan returns.
 */
class StrategyDeciderSpec extends AnyFunSuite with SparkTest {

  private val attrs = Set("event_type", "name")

  test("splitAnd: top-level conjuncts only; BETWEEN keeps its AND; OR blocks the split") {
    assert(Cql.splitAnd("a = 'x' AND b = 'y'") === Seq("a = 'x'", "b = 'y'"))
    assert(Cql.splitAnd("a BETWEEN 1 AND 5") === Seq("a BETWEEN 1 AND 5"))
    assert(Cql.splitAnd("a BETWEEN 1 AND 5 AND b = 'y'") ===
      Seq("a BETWEEN 1 AND 5", "b = 'y'"))
    assert(Cql.splitAnd("(a = 'x' OR b = 'y') AND c = 'z'") ===
      Seq("(a = 'x' OR b = 'y')", "c = 'z'"))
    assert(Cql.splitAnd("a = 'x' OR b = 'y'") === Seq("a = 'x' OR b = 'y'"))
  }

  test("static cost model: id(1) < attr equals(100) < z3(200) < attr range(250) < z2(400)") {
    // id lookup beats everything
    val idWin = decide("event_type = 'login' AND id IN ('a', 'b')", "id", attrs, hasIdIndex = true)
    assert(idWin.strategy === IdLookup(Seq("a", "b")) && idWin.cost === 1L)
    assert(idWin.residual === Some("(event_type = 'login')"))
    // bare IN is a feature-id filter; numeric id lists work unquoted
    assert(decide("IN ('a')", "id", attrs, hasIdIndex = true).strategy === IdLookup(Seq("a")))
    assert(decide("id IN (5, 77)", "id", attrs, hasIdIndex = true).strategy ===
      IdLookup(Seq("5", "77")))
    // an empty IN list offers nothing (evaluates in the residual instead)
    assert(decide("IN ()", "id", attrs, hasIdIndex = true).strategy === ZScan)
    // attr equals beats spatial
    val attrWin = decide("BBOX(geom, 0, 0, 10, 10) AND event_type = 'login'", "id", attrs, hasIdIndex = false)
    assert(attrWin.strategy === AttrEquals("event_type", Seq("login")) && attrWin.cost === 100L)
    assert(attrWin.residual === Some("(BBOX(geom, 0, 0, 10, 10))"))
    // z3 (200) beats attr RANGE (250)
    val z3Win = decide(
      "name BETWEEN 'a' AND 'b' AND BBOX(geom, 0, 0, 10, 10) AND dtg DURING 2024-01-01T00:00:00Z/2024-01-02T00:00:00Z",
      "id", attrs, hasIdIndex = false)
    assert(z3Win.strategy === ZScan && z3Win.cost === 200L)
    // spatial-only: attr range (250) beats z2 (400)
    val rangeWin = decide("name BETWEEN 'a' AND 'b' AND BBOX(geom, 0, 0, 10, 10)", "id", attrs, hasIdIndex = false)
    assert(rangeWin.strategy === AttrRange("name", "a", "b") && rangeWin.cost === 250L)
    // unindexed attributes never offer
    assert(decide("other = 'x'", "id", attrs, hasIdIndex = false).strategy === ZScan)
    // no layouts at all -> ZScan with the whole filter as residual
    val z = decide("event_type = 'login'", "id", Set.empty, hasIdIndex = false)
    assert(z.strategy === ZScan && z.residual === Some("event_type = 'login'"))
    // a residual OR group keeps its parentheses — precedence must not
    // change when conjuncts are re-joined ("a OR b AND c" trap)
    val orGroup = decide("event_type = 'login' AND (a = 'x' OR b = 'y') AND c = 'w'",
      "id", attrs, hasIdIndex = false)
    assert(orGroup.strategy === AttrEquals("event_type", Seq("login")))
    assert(orGroup.residual === Some("((a = 'x' OR b = 'y')) AND (c = 'w')"))
    // a partially-quoted or non-literal IN list offers nothing (routing
    // it would silently drop the unparsed values)
    assert(decide("event_type IN ('click', 7)", "id", attrs, hasIdIndex = false).strategy
      === AttrEquals("event_type", Seq("click", "7")))
    assert(decide("event_type IN ('click', foo)", "id", attrs, hasIdIndex = false).strategy
      === ZScan)
    // cardinality hints (AttributeFilterStrategy.scala:73-75): low *10
    // flips an attr-equals loss to z3; high /10 flips a range loss to a win
    val lowCard = decide(
      "event_type = 'login' AND BBOX(geom, 0, 0, 10, 10) AND dtg DURING 2024-01-01T00:00:00Z/2024-01-02T00:00:00Z",
      "id", attrs, hasIdIndex = false, cardinality = Map("event_type" -> "low"))
    assert(lowCard.strategy === ZScan && lowCard.cost === 200L) // 1000 > 200
    val highCard = decide(
      "name BETWEEN 'a' AND 'b' AND BBOX(geom, 0, 0, 10, 10) AND dtg DURING 2024-01-01T00:00:00Z/2024-01-02T00:00:00Z",
      "id", attrs, hasIdIndex = false, cardinality = Map("name" -> "high"))
    assert(highCard.strategy === AttrRange("name", "a", "b") && highCard.cost === 25L)
  }

  test("queryPlanned routes to the id/attr layouts and matches the full scan") {
    val s = spark
    import s.implicits._
    StFunctions.register(s)
    val dir = java.nio.file.Files.createTempDirectory("graft_decider").toString
    val df = (0 until 500).map { i =>
      (s"f$i", if (i % 5 == 0) "login" else "view",
        -20.0 + (i % 40), -10.0 + (i % 20), i.toLong)
    }.toDF("id", "event_type", "lon", "lat", "value")
    SpatialTable.write(spark, df, dir, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4)
    SpatialTable.writeAttributeIndex(spark, dir, "s1", "event_type")
    SpatialTable.writeAttributeIndex(spark, dir, "s1", "value")
    SpatialTable.writeIdIndex(spark, dir, "s1", "id")

    def both(cql: String): (Set[String], Set[String]) = {
      val planned = SpatialTable.queryPlanned(spark, dir, "s1", cql)
        .select("id").collect().map(_.getString(0)).toSet
      val full = SpatialTable.queryCql(spark, dir, "s1", cql)
        .select("id").collect().map(_.getString(0)).toSet
      (planned, full)
    }

    // id route (+ residual)
    val (p1, f1) = both("id IN ('f0', 'f5', 'f7') AND event_type = 'login'")
    assert(p1 === f1 && p1 === Set("f0", "f5"))
    // attr route with spatial residual
    val (p2, f2) = both("event_type = 'login' AND BBOX(geom, -20.5, -10.5, -10.5, -0.5)")
    assert(p2 === f2 && p2.nonEmpty)
    // pure spatial falls back to the primary z scan
    val (p3, f3) = both("BBOX(geom, -20.5, -10.5, -10.5, -0.5)")
    assert(p3 === f3 && p3.nonEmpty)
    // attr range route
    val (p4, f4) = both("value BETWEEN 10 AND 20")
    assert(p4 === f4 && p4.size === 11)
    // duplicate IN values must not duplicate rows (single scan, not a union)
    val dupCount = SpatialTable.queryPlanned(spark, dir, "s1",
      "event_type IN ('login', 'login')").count()
    assert(dupCount === 100)
    // the residual OR-group precedence case end-to-end
    val (p5, f5) = both(
      "event_type = 'login' AND (value = 0 OR value = 5) AND id = 'f0'")
    assert(p5 === f5 && p5 === Set("f0"))
  }
}
