package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.DataFrame
import org.locationtech.jts.geom.Point
import graft.geom.GeomOps

/**
 * Minimal ESRI Shapefile writer (point shapes) from the published
 * format specification ("ESRI Shapefile Technical Description", 1998):
 * .shp (geometry), .shx (record index), .dbf (dBASE III attributes).
 * The reference exposes shapefile export in its tools module
 * (geomesa-tools export -F shp); like there, this is the small-result
 * interchange path — the writer collects (bounded, `maxRows` guard)
 * because the format has a single global header with file length and
 * bbox. Scale exports use Parquet/Arrow/GeoJSON.
 *
 * Attributes: string columns as 'C' (width 64), numeric as 'N'
 * (width 18, 6 decimals) — the classic dBASE encodings.
 */
object Shapefile {

  def writePoints(df: DataFrame, geomCol: String, pathPrefix: String,
                  maxRows: Int = 1000000): Unit = {
    val attrs = df.schema.fields.filterNot(_.name == geomCol)
    val rows = df.collect()
    require(rows.length <= maxRows,
      s"shapefile export capped at $maxRows rows (got ${rows.length}); use Parquet/Arrow for scale")
    val geomIdx = df.schema.fieldIndex(geomCol)
    val pts = rows.map { r =>
      GeomOps.fromWkb(r.getAs[Array[Byte]](geomIdx)) match {
        case p: Point => (p.getX, p.getY)
        case g => val c = g.getCentroid; (c.getX, c.getY)
      }
    }
    val (xs, ys) = (pts.map(_._1), pts.map(_._2))
    val bbox =
      if (pts.isEmpty) (0.0, 0.0, 0.0, 0.0)
      else (xs.min, ys.min, xs.max, ys.max)

    // ---- .shp ---------------------------------------------------------
    val recContentWords = 10 // shapeType(4) + x(8) + y(8) = 20 bytes
    val shpLenWords = 50 + rows.length * (4 + recContentWords) // header 100B = 50 words
    def header(lenWords: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(100)
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(9994); b.position(24); b.putInt(lenWords)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000) // version
      b.putInt(1)    // shape type: point
      b.putDouble(bbox._1); b.putDouble(bbox._2); b.putDouble(bbox._3); b.putDouble(bbox._4)
      b.putDouble(0); b.putDouble(0); b.putDouble(0); b.putDouble(0)
      b.array()
    }
    val shp = new DataOutputStream(new FileOutputStream(pathPrefix + ".shp"))
    shp.write(header(shpLenWords))
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      val b = ByteBuffer.allocate(8 + 20)
      b.order(ByteOrder.BIG_ENDIAN); b.putInt(i + 1); b.putInt(recContentWords)
      b.order(ByteOrder.LITTLE_ENDIAN); b.putInt(1); b.putDouble(x); b.putDouble(y)
      shp.write(b.array())
    }
    shp.close()

    // ---- .shx ---------------------------------------------------------
    val shx = new DataOutputStream(new FileOutputStream(pathPrefix + ".shx"))
    shx.write(header(50 + rows.length * 4))
    var offsetWords = 50
    pts.indices.foreach { _ =>
      val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
      b.putInt(offsetWords); b.putInt(recContentWords)
      shx.write(b.array())
      offsetWords += 4 + recContentWords
    }
    shx.close()

    // ---- .dbf (dBASE III) --------------------------------------------
    val fieldDefs = attrs.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => (f.name.take(10), 'N', 18, 6)
        case _ => (f.name.take(10), 'C', 64, 0)
      }
    }
    val recSize = 1 + fieldDefs.map(_._3).sum
    val headerSize = 32 + fieldDefs.length * 32 + 1
    val dbf = new DataOutputStream(new FileOutputStream(pathPrefix + ".dbf"))
    val hb = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(0x03.toByte); hb.put(124.toByte); hb.put(1.toByte); hb.put(1.toByte) // version + YMD
    hb.putInt(rows.length); hb.putShort(headerSize.toShort); hb.putShort(recSize.toShort)
    hb.position(32)
    fieldDefs.foreach { case (name, kind, len, dec) =>
      val fb = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      val nb = name.getBytes("ASCII")
      fb.put(nb, 0, math.min(nb.length, 10))
      fb.position(11); fb.put(kind.toByte)
      fb.position(16); fb.put(len.toByte); fb.put(dec.toByte)
      hb.put(fb.array())
    }
    hb.put(0x0d.toByte) // header terminator
    dbf.write(hb.array())
    rows.foreach { r =>
      val rb = new StringBuilder
      rb.append(' ') // not deleted
      attrs.zip(fieldDefs).foreach { case (f, (_, kind, len, dec)) =>
        val idx = df.schema.fieldIndex(f.name)
        val v = if (r.isNullAt(idx)) "" else r.get(idx).toString
        val s =
          if (kind == 'N') {
            // Locale.ROOT: dBASE 'N' requires '.' decimals regardless of
            // the JVM's default (comma-decimal) locale
            val num = if (v.isEmpty) ""
              else String.format(java.util.Locale.ROOT, "%18.6f", Double.box(v.toDouble)).trim
            (" " * math.max(0, len - num.length)) + num.take(len) // right-justified
          } else v.padTo(len, ' ').take(len)
        rb.append(s)
      }
      dbf.write(rb.toString.getBytes("ASCII"))
    }
    dbf.write(0x1a) // EOF
    dbf.close()
  }
}
