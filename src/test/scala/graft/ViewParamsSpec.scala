package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Ports the reference's ViewParamsTest (geomesa-index-api/.../geoserver/
  * ViewParamsTest.scala:29-47 — "handle all types of query hints") onto
  * the [[ViewParams]] translation, then runs a view-params-driven query
  * end-to-end through QueryRunner. */
class ViewParamsSpec extends AnyFunSuite with Matchers with SparkTest {

  test("handle all types of query hints (reference fixture values)") {
    def one(name: String, value: String): ViewParams.Parsed =
      ViewParams.parse(Map(name -> value))

    one("QUERY_INDEX", "index-test").advisory("QUERY_INDEX") shouldBe "index-test"
    one("STRATEGY", "index-test").advisory("QUERY_INDEX") shouldBe "index-test" // alias
    one("BIN_TRACK", "track").query.binTrack.map(_.track) shouldBe Some("track")
    one("COST_EVALUATION", "stats").advisory("COST_EVALUATION") shouldBe "stats"
    one("DENSITY_BBOX", "[-120.0, -45, 10, -35.01]").query.density.map(_.bbox) shouldBe
      Some((-120.0, -45.0, 10.0, -35.01))
    one("ENCODE_STATS", "true").advisory("ENCODE_STATS") shouldBe true
    one("ENCODE_STATS", "false").advisory("ENCODE_STATS") shouldBe false
    one("DENSITY_WIDTH", "640").query.density.map(_.width) shouldBe Some(640)
    one("SAMPLING", "0.4").query.sampling shouldBe Some(0.4)
  }

  test("bad values and unknown params are skipped, not fatal (reference log-and-skip)") {
    val p = ViewParams.parse(Map(
      "DENSITY_WIDTH" -> "not-a-number",
      "DENSITY_BBOX" -> "nope",
      "COST_EVALUATION" -> "guesswork",
      "SOME_RANDOM_PARAM" -> "x",
      "SAMPLING" -> "0.25"))
    p.query.sampling shouldBe Some(0.25)
    p.query.density shouldBe None
    p.advisory shouldBe empty
    p.ignored.keySet shouldBe
      Set("DENSITY_WIDTH", "DENSITY_BBOX", "COST_EVALUATION", "SOME_RANDOM_PARAM")
  }

  test("density params compose into one hint; BIN_DTG without BIN_TRACK is dropped") {
    val p = ViewParams.parse(Map(
      "DENSITY_BBOX" -> "[-10, -10, 10, 10]",
      "DENSITY_WIDTH" -> "32",
      "DENSITY_HEIGHT" -> "16",
      "DENSITY_WEIGHT" -> "value"))
    p.query.density shouldBe Some(DensityHint((-10.0, -10.0, 10.0, 10.0), 32, 16, Some("value")))

    val orphan = ViewParams.parse(Map("BIN_DTG" -> "dtg"))
    orphan.query.binTrack shouldBe None
    orphan.ignored should contain key "BIN_DTG"

    val full = ViewParams.parse(Map("BIN_TRACK" -> "name", "BIN_DTG" -> "when"))
    full.query.binTrack shouldBe Some(BinHint("name", "when"))
  }

  test("view-params-driven density query runs end-to-end") {
    import spark.implicits._
    val df = (0 until 500).map { i =>
      (i.toLong, (i % 36) * 10.0 - 175.0, (i % 17) * 10.0 - 80.0)
    }.toDF("id", "lon", "lat")
    val q = ViewParams.parse(Map(
      "DENSITY_BBOX" -> "[-180, -90, 180, 90]",
      "DENSITY_WIDTH" -> "36",
      "DENSITY_HEIGHT" -> "18")).query
    val out = QueryRunner.run(df, q)
    out.agg(sum("n")).as[Long].head() shouldBe 500L
    out.columns should contain allOf ("i", "j", "n")
  }
}
