package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkTest

/**
 * Transform-process analogs vs the reference semantics
 * (geomesa-process-vector transform/DateOffsetProcess.scala,
 * HashAttributeProcess.scala).
 */
class TransformsSpec extends AnyFunSuite with Matchers with SparkTest {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, "2024-03-01T00:00:00Z", "click"),
    (2L, "2024-03-01T12:34:56.789Z", "view"),
    (3L, "2024-12-31T23:59:59Z", "purchase"),
    (4L, "2024-06-15T06:00:00Z", null)
  ).toDF("id", "tss", "kind").withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  private def tsOf(id: Long, out: org.apache.spark.sql.DataFrame): Timestamp =
    out.where(col("id") === id).select("ts").as[Timestamp].head()

  test("dateOffset shifts by exact Duration semantics (like the reference's ZonedDateTime.plus)") {
    val plus = Transforms.dateOffset(df, "ts", "P1D")
    tsOf(1L, plus) shouldBe Timestamp.from(java.time.Instant.parse("2024-03-02T00:00:00Z"))
    // sub-second precision preserved
    tsOf(2L, plus) shouldBe Timestamp.from(java.time.Instant.parse("2024-03-02T12:34:56.789Z"))
    // day rollover across year boundary
    tsOf(3L, plus) shouldBe Timestamp.from(java.time.Instant.parse("2025-01-01T23:59:59Z"))

    val minus = Transforms.dateOffset(df, "ts", "PT-6H30M") // Duration grammar: -6h +30m
    tsOf(1L, minus) shouldBe Timestamp.from(java.time.Instant.parse("2024-02-29T18:30:00Z"))

    val neg = Transforms.dateOffset(df, "ts", "-PT1.5S")
    tsOf(1L, neg) shouldBe Timestamp.from(java.time.Instant.parse("2024-02-29T23:59:58.5Z"))
  }

  test("dateOffset rejects malformed offsets loudly (reference throws IllegalArgumentException)") {
    an[IllegalArgumentException] should be thrownBy Transforms.dateOffset(df, "ts", "1 day")
  }

  test("hashAttribute buckets equal String.hashCode % modulo; null hashes as empty string") {
    val out = Transforms.hashAttribute(df, "kind", 7).select("id", "hash")
      .as[(Long, Int)].collect().toMap
    out(1L) shouldBe math.abs("click".hashCode) % 7
    out(2L) shouldBe math.abs("view".hashCode) % 7
    out(3L) shouldBe math.abs("purchase".hashCode) % 7
    out(4L) shouldBe math.abs("".hashCode) % 7 // reference: getOrElse("")
    out.values.foreach { h => h should be >= 0; h should be < 7 }
  }

  test("hashAttribute stays in [0, modulo) even for hashCode == Int.MinValue") {
    // "polygenelubricants".hashCode == Int.MinValue, where 32-bit abs is
    // a no-op and the bucket would go NEGATIVE without the long widening
    "polygenelubricants".hashCode shouldBe Int.MinValue
    val weird = Seq((1L, "polygenelubricants")).toDF("id", "kind")
    val h = Transforms.hashAttribute(weird, "kind", 7).select("hash").as[Int].head()
    h shouldBe (math.abs(Int.MinValue.toLong) % 7).toInt
    h should be >= 0
    val c = Transforms.hashAttributeColor(weird, "kind", 7).select("hash").as[String].head()
    c should startWith("#")
  }

  test("hashAttribute stringifies non-string attributes like the reference's _.toString") {
    val out = Transforms.hashAttribute(df, "id", 5).select("id", "hash")
      .as[(Long, Int)].collect().toMap
    out(3L) shouldBe math.abs("3".hashCode) % 5
  }

  test("hashAttributeColor maps the bucket onto the reference's 7-color palette") {
    val out = Transforms.hashAttributeColor(df, "kind", 10).select("id", "hash")
      .as[(Long, String)].collect().toMap
    val expected = Array("#6495ED", "#B0C4DE", "#00FFFF", "#9ACD32", "#00FA9A", "#FFF8DC", "#F5DEB3")
    out(1L) shouldBe expected((math.abs("click".hashCode) % 10) % 7)
    out.values.foreach(c => expected should contain(c))
  }

  test("both transforms stay native: no ScalaUDF, inside WholeStageCodegen") {
    // spark.range (not a local Seq) so the projection can't constant-fold
    // into a LocalTableScan — the plan must show the codegen'd stage
    val wide = spark.range(1000)
      .selectExpr("id", "CAST(id % 5 AS STRING) AS kind",
        "timestamp_micros(id * 1000000) AS ts")
    val out = Transforms.hashAttribute(
      Transforms.dateOffset(wide, "ts", "P1D"), "kind", 7)
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "ScalaUDF"
    // the *(N) stage marker is how WholeStageCodegen prints in toString
    "\\*\\(\\d+\\)".r.findFirstIn(plan) should not be empty
    // and the codegen'd hash agrees with the JVM reference value
    out.where(col("id") === 3L).select("hash").as[Int].head() shouldBe
      math.abs("3".hashCode) % 7
  }
}
