package graft.images

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.cells.Cells

/** Image payload invariants (BASELINE.json input_hint): deterministic
  * generation, decode parity (PNG exact, JPEG PSNR >= 40 dB), caption
  * equality, phash stability, and the Spark-side table shape. */
class ImageSpec extends AnyFunSuite with SparkTest {

  test("generator is deterministic per id") {
    val a = SyntheticImages.row(42L)
    val b = SyntheticImages.row(42L)
    assert(a.image_id == b.image_id && a.caption == b.caption && a.phash == b.phash)
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
  }

  test("PNG decode is lossless; JPEG decode PSNR >= 40 dB") {
    (0L until 24L).foreach { id =>
      val src = SyntheticImages.render(id)
      val srcPx = ImageCodec.rgb(src)
      val row = SyntheticImages.row(id)
      val decoded = ImageCodec.decode(row.bytes)
      assert(decoded.getWidth == row.w && decoded.getHeight == row.h)
      val p = ImageCodec.psnr(srcPx, ImageCodec.rgb(decoded))
      if (row.fmt == "png") assert(p.isInfinity, s"id=$id png not lossless: $p")
      else assert(p >= 40.0, s"id=$id jpeg psnr $p < 40")
    }
  }

  test("phash is stable under lossy re-encode (hamming <= 6)") {
    (0L until 16L).foreach { id =>
      val src = SyntheticImages.render(id)
      val jpeg = ImageCodec.encodeJpeg(src)
      val h1 = ImageCodec.averageHash(src)
      val h2 = ImageCodec.averageHash(ImageCodec.decode(jpeg))
      assert(ImageCodec.hammingDistance(h1, h2) <= 6, s"id=$id phash unstable")
    }
  }

  test("caption embeds the image id and is deterministic") {
    val r = SyntheticImages.row(7L)
    assert(r.caption.contains(r.image_id))
    assert(r.caption == SyntheticImages.caption(7L))
  }

  test("Spark table has the exact input_hint schema and n rows") {
    val ds = SyntheticImages.table(spark, 50, partitions = 4)
    val fields = ds.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(fields == Seq(
      "image_id" -> "string", "bytes" -> "binary", "w" -> "int", "h" -> "int",
      "fmt" -> "string", "caption" -> "string", "phash" -> "bigint"))
    assert(ds.count() == 50)
    // per-row invariant on a sample, executed distributed
    val bad = ds.limit(8).collect().filterNot { r =>
      val img = ImageCodec.decode(r.bytes)
      img.getWidth == r.w && img.getHeight == r.h && r.caption.contains(r.image_id)
    }
    assert(bad.isEmpty)
  }

  test("geoTable derives footprint containing the center point, in valid range") {
    val df = SyntheticImages.geoTable(spark, 100, partitions = 4)
    import org.apache.spark.sql.functions._
    val checked = df.selectExpr(
      "lon", "lat",
      "st_contains(footprint, st_makePoint(lon, lat)) as ok",
      "st_cell(footprint, 9) as cell")
    val rows = checked.collect()
    assert(rows.forall(_.getBoolean(2)))
    rows.foreach { r =>
      assert(r.getDouble(0) >= -180.3 && r.getDouble(0) <= 180.3)
      assert(r.getDouble(1) >= -60.5 && r.getDouble(1) <= 60.5)
      assert(Cells.res(r.getLong(3)) == 9)
    }
  }

  test("hotspot skew exists by construction (some cell holds >2% of rows)") {
    val df = SyntheticImages.geoTable(spark, 2000, partitions = 4)
    val top = df.selectExpr("st_cellOfXY(lon, lat, 7) as cell")
      .groupBy("cell").count().orderBy(org.apache.spark.sql.functions.desc("count"))
      .head.getLong(1)
    assert(top > 40, s"expected hot cell, top count = $top")
  }
}
