package graft.table

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTest

/** Ports the reference's DefaultSplitterTest (geomesa-index-api/.../
  * conf/splitter/DefaultSplitterTest.scala:22-104) byte-for-byte, then
  * exercises the Spark-side range assignment the split points drive. */
class SplitterSpec extends AnyFunSuite with Matchers with SparkTest {

  private val sft = Sft.parse("test",
    "myString:String:index=true,myInt:Int:index=true,dtg:Date,*geom:Point:srid=4326")

  private def str(b: Array[Byte]) = new String(b, StandardCharsets.UTF_8)

  test("produce correct z3 splits") {
    val splits = Splitter.splits(sft, "z3", "z3.min:2017-01-01,z3.max:2017-01-10,z3.bits:4")
    splits should have length 32
    val decoded = splits.map { s =>
      val bin = ((s(0) & 0xff) << 8) | (s(1) & 0xff)
      (bin, s(2).toInt, s.drop(3).map(_.toInt).sum)
    }
    decoded should contain theSameElementsAs
      Seq(2452, 2453).flatMap(w => Range(0, 128, 8).map((w, _, 0)))
  }

  test("produce correct string splits") {
    val splits = Splitter.splits(sft, "attr", "attr.myString.pattern:[A-Z]")
    splits should have length 26
    splits.map(str).mkString shouldBe "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  }

  test("produce correct union string splits") {
    val splits = Splitter.splits(sft, "attr", "attr.myString.pattern:[A-Z0-9]")
    splits should have length 36
    splits.map(str).mkString shouldBe "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
  }

  test("produce correct tiered string splits") {
    val splits = Splitter.splits(sft, "attr", "attr.myString.pattern:[A-B][A-C]")
    splits should have length 6
    splits.map(str).mkString(",") shouldBe "AA,AB,AC,BA,BB,BC"
  }

  test("produce correct aggregated string splits") {
    val splits = Splitter.splits(sft, "attr",
      "attr.myString.pattern:[0-9],attr.myString.pattern2:[8-8][0-9]")
    splits should have length 20
    splits.map(str) shouldBe ((0 to 9).map(_.toString) ++ (0 to 9).map(i => s"8$i"))
  }

  test("produce correct int splits (lexicoded hex)") {
    val splits = Splitter.splits(sft, "attr", "attr.myInt.pattern:[0-9]")
    splits should have length 10
    splits.map(str) shouldBe (0 until 10).map(i => s"8000000$i")
  }

  test("produce correct union int splits") {
    val splits = Splitter.splits(sft, "attr", "attr.myInt.pattern:[0-15-6]")
    splits.map(str) shouldBe Seq("80000000", "80000001", "80000005", "80000006")
  }

  test("produce correct tiered int splits") {
    val splits = Splitter.splits(sft, "attr", "attr.myInt.pattern:[0-1][2-3]")
    splits.map(str) shouldBe Seq("80000002", "80000003", "8000000c", "8000000d")
  }

  test("produce correct aggregated int splits") {
    val splits = Splitter.splits(sft, "attr",
      "attr.myInt.pattern:[0-9],attr.myInt.pattern2:[8-8][0-9]")
    splits should have length 20
    splits.map(str) shouldBe ((0 until 10).map(i => s"8000000$i") ++ (0 to 9).map(i => s"8000005$i"))
  }

  test("reject invalid int splits") {
    an[IllegalArgumentException] should be thrownBy
      Splitter.splits(sft, "attr", "attr.myInt.pattern:[A-Z]")
  }

  test("id splits default to the hex distribution") {
    Splitter.splits(sft, "id", "").map(str) shouldBe Seq("0", "4", "8", "c")
  }

  test("z2 splits are bit prefixes below the two masked bits") {
    val splits = Splitter.splits(sft, "z2", "z2.bits:2")
    splits should have length 4
    splits.map(_(0).toInt) shouldBe Seq(0, 16, 32, 48)
    splits.foreach(_.length shouldBe 8)
  }

  test("rangeId distributes keys across the pre-split regions") {
    import spark.implicits._
    val splits = Splitter.splits(sft, "attr", "attr.myString.pattern:[b-y]")
    val df = (0 until 260).map(i => ('a' + (i % 26)).toChar.toString + i).toDF("key")
      .withColumn("region", Splitter.rangeId(col("key").cast("binary"), splits))
    val regions = df.groupBy("region").count().collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // 'a' keys fall before the first split (region 0); 'z' after the last
    regions.keySet shouldBe (0 to 24).toSet
    regions.values.sum shouldBe 260L
    // balanced: every region gets exactly one letter's share
    regions(0) shouldBe 10L
    regions(24) shouldBe 20L // 'y' and 'z' both land past the last boundary at 'y'
  }
}
