package graft.sources

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkTest
import graft.functions.StFunctions

/**
 * BinaryOutputEncoderTest ported (geomesa-utils/src/test/scala/.../bin/
 * BinaryOutputEncoderTest.scala:34-130): the same point fixture (track
 * "1234-$i", label 10+i, POINT(45 5i), dtg descending by minute) decoded
 * byte-for-byte from the written `.bin` files — with label (24-byte),
 * without label (16-byte), and with the feature id as the track; plus
 * the line fixture (one record per vertex, positional dates) and the
 * chronological sort mode.
 */
class BinExportSpec extends AnyFunSuite with Matchers with SparkTest {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))
  private val baseDtg = Instant.parse("2014-01-01T08:09:00.000Z").toEpochMilli

  // BinaryOutputEncoderTest:39-47
  private lazy val points = {
    import spark.implicits._
    (0 until 4).map { i =>
      (s"$i", s"1234-$i", 10L + i, 45.0, 50.0 + i, ts(s"2014-01-01T08:0${9 - i}:00.000Z"))
    }.toDF("id", "track", "label", "lon", "lat", "dtg")
  }

  private def readBin(dir: String): Array[Byte] = {
    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".bin")).sorted
    parts.flatMap(p => Files.readAllBytes(Paths.get(p)))
  }

  test("point collection with label field: 24-byte records round-trip") {
    val dir = Files.createTempDirectory("graft_bin").toString
    val n = BinExport.write(points.coalesce(1), dir, "track", "dtg", "lon", "lat",
      label = Some("label"))
    n shouldBe 4
    val encoded = readBin(dir)
    encoded.length shouldBe 4 * 24
    val decoded = BinExport.decodeAll(encoded, 24).sortBy(-_.dtg)
    (0 until 4).foreach { i =>
      decoded(i).dtg shouldBe baseDtg - 60 * 1000 * i
      decoded(i).lat shouldBe (50f + i)
      decoded(i).lon shouldBe 45f
      decoded(i).trackId shouldBe s"1234-$i".hashCode
      decoded(i).label shouldBe (10L + i)
    }
  }

  test("point collection without label field: 16-byte records, label decodes -1") {
    val dir = Files.createTempDirectory("graft_bin").toString
    BinExport.write(points.coalesce(1), dir, "track", "dtg", "lon", "lat") shouldBe 4
    val encoded = readBin(dir)
    encoded.length shouldBe 4 * 16
    val decoded = BinExport.decodeAll(encoded, 16).sortBy(-_.dtg)
    (0 until 4).foreach { i =>
      decoded(i).dtg shouldBe baseDtg - 60 * 1000 * i
      decoded(i).lat shouldBe (50f + i)
      decoded(i).lon shouldBe 45f
      decoded(i).trackId shouldBe s"1234-$i".hashCode
      decoded(i).label shouldBe -1L
    }
  }

  test("feature id as the track field") {
    val dir = Files.createTempDirectory("graft_bin").toString
    BinExport.write(points.coalesce(1), dir, "id", "dtg", "lon", "lat") shouldBe 4
    val decoded = BinExport.decodeAll(readBin(dir), 16).sortBy(-_.dtg)
    (0 until 4).foreach { i =>
      decoded(i).trackId shouldBe s"$i".hashCode
    }
  }

  // BinaryOutputEncoderTest:97-130 — one record per LineString vertex,
  // dtg positional from the dates list
  test("line collection: one record per vertex with positional dates") {
    import spark.implicits._
    StFunctions.register(spark)
    val dates = (0 until 4).map(i => ts(s"2014-01-01T08:00:0${9 - i}.000Z"))
    val df = Seq(("1234-0", 10L, dates))
      .toDF("track", "label", "dates")
      .withColumn("geom", expr("st_geomFromWKT('LINESTRING(45 50, 46 51, 47 52, 50 55)')"))
    val exploded = BinExport.explodeLine(df, "geom", "dates")
    val dir = Files.createTempDirectory("graft_bin").toString
    BinExport.write(exploded.coalesce(1), dir, "track", "dtg", "lon", "lat",
      label = Some("label")) shouldBe 4
    val decoded = BinExport.decodeAll(readBin(dir), 24).sortBy(-_.dtg)
    val coords = Seq((45f, 50f), (46f, 51f), (47f, 52f), (50f, 55f))
    (0 until 4).foreach { i =>
      decoded(i).dtg shouldBe dates(i).getTime
      decoded(i).lon shouldBe coords(i)._1
      decoded(i).lat shouldBe coords(i)._2
      decoded(i).trackId shouldBe "1234-0".hashCode
      decoded(i).label shouldBe 10L
    }
  }

  test("empty LineString emits zero records (sequence(1,0) would yield [1,0])") {
    import spark.implicits._
    StFunctions.register(spark)
    val df = Seq(("t", 1L, Seq.empty[Timestamp]))
      .toDF("track", "label", "dates")
      .withColumn("geom", expr("st_geomFromWKT('LINESTRING EMPTY')"))
    BinExport.explodeLine(df, "geom", "dates").count() shouldBe 0
  }

  test("label conversion rules match the reference (numeric / string / null)") {
    BinExport.labelToLong(null) shouldBe 0L
    BinExport.labelToLong(java.lang.Long.valueOf(42L)) shouldBe 42L
    BinExport.labelToLong(java.lang.Integer.valueOf(7)) shouldBe 7L
    // first 8 UTF-8 bytes packed little-endian
    BinExport.labelToLong("a") shouldBe 'a'.toLong
    BinExport.labelToLong("ab") shouldBe ('a'.toLong + ('b'.toLong << 8))
    BinExport.labelToLong("abcdefghXYZ") shouldBe BinExport.labelToLong("abcdefgh")
  }

  test("sortByTime orders records chronologically within and across part files") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 1000
    val df = rnd.shuffle((0 until n).toList).map { i =>
      (s"t${i % 5}", ts(f"2014-01-01T00:00:00.000Z").toInstant.plusSeconds(i * 60L).toEpochMilli)
    }.toDF("track", "millis")
      .withColumn("dtg", timestamp_millis(col("millis")))
      .withColumn("lon", lit(1.0)).withColumn("lat", lit(2.0))
      .repartition(8)
    val dir = Files.createTempDirectory("graft_bin").toString
    BinExport.write(df, dir, "track", "dtg", "lon", "lat",
      sortByTime = true, sortPartitions = 4) shouldBe n
    val decoded = BinExport.decodeAll(readBin(dir), 16)
    decoded.length shouldBe n
    // readBin concatenates part files in name order; range partitioning
    // + in-partition sort must yield a globally sorted stream
    decoded.map(_.dtg) shouldBe decoded.map(_.dtg).sorted
  }
}
