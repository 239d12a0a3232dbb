package graft.plans

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.{BinHint, GraftQuery, QueryRunner, SparkTest}
import graft.functions.StFunctions

/**
 * The reference's RecordIdxStrategyTest fixture run through the Query
 * facade (geomesa-accumulo-datastore/src/test/scala/org/locationtech/
 * geomesa/accumulo/index/RecordIdxStrategyTest.scala:54-210): the same
 * 20 features (name$i, track1/track2 split at i=10, hourly dtg,
 * POINT(2i i), feature id "$i"), the same feature-ID filters, BIN
 * hints, and SAMPLING/SAMPLE_BY hint combinations, asserting the
 * reference's exact counts, id sets, and BIN track hashes
 * ("name2".hashCode — BinaryOutputEncoder's Java String.hashCode wire
 * id). The intersectIdFilters scenarios (:168-207) are run end-to-end:
 * AND-ed bare IN(...) id filters must evaluate to the set
 * intersection.
 */
class RecordStrategyParitySpec extends AnyFunSuite with Matchers with SparkTest {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  // RecordIdxStrategyTest.scala:56-66 — the 20 features
  private lazy val records: DataFrame = {
    import spark.implicits._
    StFunctions.register(spark)
    (0 until 20).map { i =>
      (s"$i", s"name$i", if (i < 10) "track1" else "track2",
        ts(f"2010-05-07T$i%02d:00:00.000Z"), (i * 2).toDouble, i.toDouble)
    }.toDF("id", "name", "track", "dtg", "lon", "lat")
  }

  private val geomProp = Map("geom" -> expr("st_makePoint(lon, lat)"))

  private def run(q: GraftQuery): DataFrame =
    QueryRunner.run(records, q, geomProp, idColumn = "id")

  private def ids(df: DataFrame): Set[String] =
    df.select("id").collect().map(_.getString(0)).toSet

  test("NOT queries: NOT IN('2','3') returns the other 18 ids") { // :74-79
    val out = run(GraftQuery(cql = "NOT IN('2', '3')"))
    out.count() shouldBe 18
    ids(out) shouldBe ((Seq("0", "1") ++ (4 until 20).map(_.toString)).toSet)
  }

  test("bin queries over an id filter carry Java-hashCode track ids") { // :81-94
    val out = run(GraftQuery(cql = "IN ('2', '3')",
      binTrack = Some(BinHint("name", "dtg"))))
    out.columns.toSeq shouldBe Seq("track_hash", "dtg_s", "lat", "lon")
    val bins = out.collect()
    bins.length shouldBe 2
    bins.map(_.getInt(0)).toSet shouldBe Set("name2".hashCode, "name3".hashCode)
  }

  test("sampling .5 keeps exactly half") { // :96-101
    run(GraftQuery(sampling = Some(0.5))).count() shouldBe 10
  }

  test("sampling with cql") { // :103-109
    val out = run(GraftQuery(cql = "track = 'track1'", sampling = Some(0.5)))
    out.count() shouldBe 5
    out.select("track").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("track1")
  }

  test("sampling with transformations") { // :111-117
    val out = run(GraftQuery(transforms = Seq("name", "geom"), sampling = Some(0.5)))
    out.count() shouldBe 10
    out.columns.length shouldBe 2
  }

  test("sampling with cql and transformations") { // :119-125 (.2 of track2's 10)
    val out = run(GraftQuery(cql = "track = 'track2'",
      transforms = Seq("name", "geom"), sampling = Some(0.2)))
    out.count() shouldBe 2
    out.columns.length shouldBe 2
  }

  test("sampling by thread (SAMPLE_BY track)") { // :120-128
    val out = run(GraftQuery(sampling = Some(0.5), sampleBy = Some("track")))
    out.count() should be < 12L
    out.where(col("track") === "track1").count() should be < 6L
    out.where(col("track") === "track2").count() should be < 6L
  }

  test("sampling with bin queries") { // :130-144
    val out = run(GraftQuery(cql = "dtg AFTER 2010-05-07T07:30:00.000Z",
      sampling = Some(0.2), sampleBy = Some("track"),
      binTrack = Some(BinHint("track", "dtg"))))
    val bins = out.collect()
    bins.length should be < 5
    bins.map(_.getInt(0)).toSet shouldBe Set("track1".hashCode, "track2".hashCode)
  }

  test("BIN trackId is the VALUE's Java hashCode for non-string tracks") {
    // convertToTrack hashes the raw attribute: Integer(21).hashCode is
    // 21, not "21".hashCode (1599); Long and Timestamp follow suit
    import spark.implicits._
    val lv = 1234567890123L
    val t0 = ts("2014-01-01T08:00:00.000Z")
    val df = Seq((1, 21, lv, t0, 45.0, 50.0))
      .toDF("id", "itrack", "ltrack", "dtg", "lon", "lat")
    def trackOf(track: String): Int =
      QueryRunner.run(df, GraftQuery(binTrack = Some(BinHint(track, "dtg"))))
        .head().getInt(0)
    trackOf("itrack") shouldBe 21
    trackOf("ltrack") shouldBe java.lang.Long.hashCode(lv)
    trackOf("dtg") shouldBe java.lang.Long.hashCode(t0.getTime)
  }

  // intersectIDFilters (:168-207), evaluated end-to-end: AND-ed id
  // filters must behave as the intersection of the id sets
  test("AND of a series of ID filters evaluates to their intersection") {
    val out = run(GraftQuery(cql =
      "IN ('4','5','6') AND IN ('5','6') AND IN ('6','5') AND IN ('5','7')"))
    ids(out) shouldBe Set("5")
  }

  test("a single ID filter returns exactly its ids") {
    ids(run(GraftQuery(cql = "IN ('5','6')"))) shouldBe Set("5", "6")
  }

  test("ID filters with no intersection return nothing") {
    val out = run(GraftQuery(cql =
      "IN ('4','5','6') AND IN ('5','6') AND IN ('6','7') AND IN ('7','8')"))
    out.count() shouldBe 0
  }
}
