package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DoubleType, LongType, StringType, StructField, StructType}
import org.locationtech.jts.geom._
import org.locationtech.jts.algorithm.Orientation
import graft.geom.GeomOps

/**
 * ESRI Shapefile writer (Point / MultiPoint / PolyLine / Polygon) from
 * the published format specification ("ESRI Shapefile Technical
 * Description", 1998): .shp (geometry), .shx (record index), .dbf
 * (dBASE III attributes). The reference exposes shapefile export in its
 * tools module (geomesa-tools export -F shp, ShapefileExporter.scala);
 * like there, this is the small-result interchange path — the format
 * has a single global header (file length + bbox) and a 2 GB cap, so it
 * can never be a 100-TB output. Scale exports use Parquet/Arrow/GeoJSON.
 *
 * The writer STREAMS: rows arrive partition-at-a-time via
 * `toLocalIterator` (never a whole-DataFrame collect), records are
 * written incrementally to all three files, and the headers (which need
 * total length / bbox / record count) are patched afterwards via
 * RandomAccessFile. `maxRows` is enforced incrementally — exceeding it
 * fails fast mid-stream instead of OOM-ing the driver first.
 *
 * Attributes: string columns as 'C' (width 64), integral numerics as
 * 'N' (width 18, 0 decimals), fractional as 'N' (width 18, 6 decimals)
 * — the classic dBASE encodings. A numeric whose fixed-point rendering
 * exceeds the field width falls back to scientific notation at reduced
 * precision (never silently truncated; if even "%.0e" cannot fit, the
 * export fails).
 */
object Shapefile {

  /** Geometry family -> ESRI shape type (spec table 1). */
  private def shapeTypeOf(g: Geometry): Int = g match {
    case _: Point => 1
    case _: LineString | _: MultiLineString => 3
    case _: Polygon | _: MultiPolygon => 5
    case _: MultiPoint => 8
    case other => throw new IllegalArgumentException(
      s"unsupported shapefile geometry: ${other.getGeometryType}")
  }

  /** Backwards-compatible points entry (validates the Point family —
    * non-point geometries are an error now, not a silent centroid). */
  def writePoints(df: DataFrame, geomCol: String, pathPrefix: String,
                  maxRows: Int = 1000000): Unit =
    write(df, geomCol, pathPrefix, maxRows)

  def write(df: DataFrame, geomCol: String, pathPrefix: String,
            maxRows: Int = 1000000): Unit = {
    val attrs = df.schema.fields.filterNot(_.name == geomCol)
    val geomIdx = df.schema.fieldIndex(geomCol)
    val attrIdx = attrs.map(f => df.schema.fieldIndex(f.name))

    val fieldDefs = attrs.map { f =>
      import org.apache.spark.sql.types._
      f.dataType match {
        // width 20 fits any Long incl. sign (ESRI allows N up to 33);
        // integral values render from their exact decimal string, never
        // through Double (2^53 cliff)
        case ByteType | ShortType | IntegerType | LongType => (f.name.take(10), 'N', 20, 0)
        case _: NumericType => (f.name.take(10), 'N', 18, 6)
        case _ => (f.name.take(10), 'C', 64, 0)
      }
    }
    val recSize = 1 + fieldDefs.map(_._3).sum
    val dbfHeaderSize = 32 + fieldDefs.length * 32 + 1

    val shp = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(pathPrefix + ".shp")))
    val shx = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(pathPrefix + ".shx")))
    val dbf = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(pathPrefix + ".dbf")))

    // placeholder main headers — patched at the end (length/bbox/type)
    shp.write(new Array[Byte](100))
    shx.write(new Array[Byte](100))
    dbf.write(dbfHeader(fieldDefs, nRecords = 0, dbfHeaderSize, recSize))

    var n = 0
    var shapeType = 0 // 0 until the first non-null geometry fixes it
    var offsetWords = 50
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue

    val it = df.toLocalIterator()
    try {
      while (it.hasNext) {
        val r = it.next()
        n += 1
        require(n <= maxRows,
          s"shapefile export capped at $maxRows rows; use Parquet/Arrow for scale")
        val geom =
          if (r.isNullAt(geomIdx)) null
          else GeomOps.fromWkb(r.getAs[Array[Byte]](geomIdx))
        val content: Array[Byte] =
          if (geom == null || geom.isEmpty) nullShape()
          else {
            val t = shapeTypeOf(geom)
            if (shapeType == 0) shapeType = t
            else require(t == shapeType,
              s"mixed geometry types in one shapefile: ${geom.getGeometryType} after type $shapeType")
            val env = geom.getEnvelopeInternal
            minX = math.min(minX, env.getMinX); minY = math.min(minY, env.getMinY)
            maxX = math.max(maxX, env.getMaxX); maxY = math.max(maxY, env.getMaxY)
            shapeContent(geom, t)
          }
        val contentWords = content.length / 2
        val rh = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
        rh.putInt(n); rh.putInt(contentWords)
        shp.write(rh.array()); shp.write(content)
        val xb = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
        xb.putInt(offsetWords); xb.putInt(contentWords)
        shx.write(xb.array())
        offsetWords += 4 + contentWords
        dbf.write(dbfRecord(r, attrs, attrIdx, fieldDefs))
      }
      dbf.write(0x1a) // EOF
    } finally { shp.close(); shx.close(); dbf.close() }

    if (n == 0) { minX = 0; minY = 0; maxX = 0; maxY = 0 }
    if (shapeType == 0) shapeType = 1 // all-null/empty file: point per convention
    patchMainHeader(pathPrefix + ".shp", offsetWords, shapeType, minX, minY, maxX, maxY)
    patchMainHeader(pathPrefix + ".shx", 50 + n * 4, shapeType, minX, minY, maxX, maxY)
    val raf = new RandomAccessFile(pathPrefix + ".dbf", "rw")
    try {
      raf.seek(4)
      val cb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN); cb.putInt(n)
      raf.write(cb.array())
    } finally raf.close()
  }

  private def nullShape(): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0)
    b.array()
  }

  /** Record content for one geometry (shape type already validated). */
  private def shapeContent(g: Geometry, shapeType: Int): Array[Byte] = shapeType match {
    case 1 =>
      val p = g.asInstanceOf[Point]
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1); b.putDouble(p.getX); b.putDouble(p.getY)
      b.array()
    case 8 =>
      val mp = g.asInstanceOf[MultiPoint]
      val pts = (0 until mp.getNumGeometries).map(i => mp.getGeometryN(i).asInstanceOf[Point])
      val b = ByteBuffer.allocate(40 + 16 * pts.length).order(ByteOrder.LITTLE_ENDIAN)
      val env = g.getEnvelopeInternal
      b.putInt(8)
      b.putDouble(env.getMinX); b.putDouble(env.getMinY)
      b.putDouble(env.getMaxX); b.putDouble(env.getMaxY)
      b.putInt(pts.length)
      pts.foreach(p => { b.putDouble(p.getX); b.putDouble(p.getY) })
      b.array()
    case 3 | 5 =>
      // PolyLine and Polygon share the parts/points layout; polygon rings
      // follow ESRI winding: outer rings clockwise, holes counter-clockwise
      val parts: Seq[Array[Coordinate]] =
        if (shapeType == 3) {
          (0 until g.getNumGeometries)
            .map(i => g.getGeometryN(i).asInstanceOf[LineString].getCoordinates)
        } else {
          (0 until g.getNumGeometries).flatMap { i =>
            val poly = g.getGeometryN(i).asInstanceOf[Polygon]
            val shell = ringCoords(poly.getExteriorRing, wantCCW = false)
            val holes = (0 until poly.getNumInteriorRing)
              .map(h => ringCoords(poly.getInteriorRingN(h), wantCCW = true))
            shell +: holes
          }
        }
      val nPts = parts.map(_.length).sum
      val b = ByteBuffer.allocate(44 + 4 * parts.length + 16 * nPts)
        .order(ByteOrder.LITTLE_ENDIAN)
      val env = g.getEnvelopeInternal
      b.putInt(shapeType)
      b.putDouble(env.getMinX); b.putDouble(env.getMinY)
      b.putDouble(env.getMaxX); b.putDouble(env.getMaxY)
      b.putInt(parts.length); b.putInt(nPts)
      var start = 0
      parts.foreach { p => b.putInt(start); start += p.length }
      parts.foreach(_.foreach(c => { b.putDouble(c.x); b.putDouble(c.y) }))
      b.array()
  }

  private def ringCoords(ring: LineString, wantCCW: Boolean): Array[Coordinate] = {
    val cs = ring.getCoordinates
    if (Orientation.isCCW(cs) == wantCCW) cs else cs.reverse
  }

  private def patchMainHeader(path: String, lenWords: Int, shapeType: Int,
                              minX: Double, minY: Double, maxX: Double, maxY: Double): Unit = {
    val b = ByteBuffer.allocate(100)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(9994); b.position(24); b.putInt(lenWords)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(1000) // version
    b.putInt(shapeType)
    b.putDouble(minX); b.putDouble(minY); b.putDouble(maxX); b.putDouble(maxY)
    b.putDouble(0); b.putDouble(0); b.putDouble(0); b.putDouble(0)
    val raf = new RandomAccessFile(path, "rw")
    try { raf.seek(0); raf.write(b.array()) } finally raf.close()
  }

  private def dbfHeader(fieldDefs: Array[(String, Char, Int, Int)], nRecords: Int,
                        headerSize: Int, recSize: Int): Array[Byte] = {
    // the dBASE header-size and record-size fields are unsigned 16-bit:
    // putShort(x.toShort) emits the right bytes up to 0xFFFF, beyond that
    // the file would 'succeed' with a garbage size and every reader would
    // misalign all records — fail loudly instead (very wide schemas)
    require(headerSize <= 0xFFFF,
      s"dBASE header size $headerSize exceeds the format's 16-bit limit (too many columns)")
    require(recSize <= 0xFFFF,
      s"dBASE record size $recSize exceeds the format's 16-bit limit (too many/too wide columns)")
    val hb = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(0x03.toByte); hb.put(124.toByte); hb.put(1.toByte); hb.put(1.toByte) // version + YMD
    hb.putInt(nRecords); hb.putShort(headerSize.toShort); hb.putShort(recSize.toShort)
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
    hb.array()
  }

  private def dbfRecord(r: org.apache.spark.sql.Row,
                        attrs: Array[org.apache.spark.sql.types.StructField],
                        attrIdx: Array[Int],
                        fieldDefs: Array[(String, Char, Int, Int)]): Array[Byte] = {
    val rb = new StringBuilder
    rb.append(' ') // not deleted
    var i = 0
    while (i < attrs.length) {
      val (_, kind, len, dec) = fieldDefs(i)
      val idx = attrIdx(i)
      val v = if (r.isNullAt(idx)) "" else r.get(idx).toString
      val s =
        if (kind == 'N') {
          // dec == 0 means an integral column: its decimal string is
          // already exact and (at width 20) always fits — routing it
          // through Double would corrupt values above 2^53
          val num =
            if (v.isEmpty) ""
            else if (dec == 0) v
            else formatNumeric(v.toDouble, len, dec)
          require(num.length <= len,
            s"dBASE 'N' value '$num' exceeds field width $len")
          (" " * (len - num.length)) + num // right-justified
        } else v.padTo(len, ' ').take(len)
      rb.append(s)
      i += 1
    }
    rb.toString.getBytes("ASCII")
  }

  // ------------------------------------------------------------------
  // read path — the ingest direction (reference: shapefile ingest via
  // geomesa-tools, ShpIngestTest.scala; GeoTools' ShapefileDataStore does
  // the per-file parsing there). One shapefile is one task (the format
  // is a single ≤2GB stream); a DIRECTORY of shapefiles reads as one
  // task per file — the scale shape for shapefile corpora. Coordinates
  // are taken as stored (the writer emits no .prj; the reference
  // reprojects non-WGS84 inputs at ingest — supplying pre-projected
  // data is the analog here).

  /** Read a shapefile (a `.shp` path, a bare prefix, or a directory of
    * shapefiles with IDENTICAL attribute schemas) into a DataFrame:
    * `geomCol` as WKB (null for null shapes) followed by the .dbf
    * attributes — 'C' as string, 'N' as long (0 decimals) or double,
    * 'L' as boolean, 'D' as "yyyyMMdd" string. */
  def read(spark: SparkSession, path: String, geomCol: String = "geom"): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    def fsOf(p: String): FileSystem = new HPath(p).getFileSystem(conf)
    val shpPaths: Seq[String] = {
      val fs = fsOf(path)
      if (path.endsWith(".shp")) Seq(path)
      else if (fs.exists(new HPath(path)) && fs.getFileStatus(new HPath(path)).isDirectory) {
        val found = fs.listStatus(new HPath(path))
          .map(_.getPath).filter(_.getName.endsWith(".shp")).map(_.toString).sorted.toSeq
        require(found.nonEmpty, s"no .shp files under $path")
        found
      } else Seq(path + ".shp")
    }
    def dbfOf(shp: String): String = shp.stripSuffix(".shp") + ".dbf"
    // the FIRST file's .dbf header fixes the schema (like Spark's CSV
    // inference reads one file); every other file must match exactly.
    // Only the header region is read on the driver (bytes 8-9 LE give
    // its length) — never the whole .dbf.
    val headerBytes: Array[Byte] = {
      val hp = new HPath(dbfOf(shpPaths.head))
      val in = fsOf(hp.toString).open(hp)
      try {
        val head = new Array[Byte](32)
        in.readFully(head)
        val headerLen = (head(8) & 0xFF) | ((head(9) & 0xFF) << 8)
        val total = math.max(33, headerLen)
        val all = new Array[Byte](total)
        System.arraycopy(head, 0, all, 0, 32)
        in.readFully(all, 32, total - 32)
        all
      } finally in.close()
    }
    val headerDefs = readDbfFieldDefs(headerBytes)
    val schema = StructType(StructField(geomCol, BinaryType) +: headerDefs.map {
      case (name, 'N', _, 0) => StructField(name, LongType)
      case (name, 'N' | 'F', _, _) => StructField(name, DoubleType)
      case (name, 'L', _, _) => StructField(name, BooleanType)
      case (name, _, _, _) => StructField(name, StringType)
    })
    val headerDefsSeq = headerDefs.toSeq
    val firstShp = shpPaths.head
    // the session's Hadoop settings (fs impls, credentials) must reach
    // the tasks — a blank Configuration would lose every spark.hadoop.*
    // option; Configuration itself is not serializable, so broadcast
    // Spark's serializable wrapper
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val rdd = spark.sparkContext.parallelize(shpPaths, math.max(1, shpPaths.size)).flatMap { shp =>
      def taskBytes(p: String): Array[Byte] = {
        val hp = new HPath(p); val fs = hp.getFileSystem(bcConf.value.value)
        val st = fs.getFileStatus(hp)
        require(st.getLen <= Int.MaxValue - 8, s"$p exceeds the shapefile 2GB bound")
        val b = new Array[Byte](st.getLen.toInt)
        val in = fs.open(hp)
        try in.readFully(b) finally in.close()
        b
      }
      val dbfBytes = taskBytes(shp.stripSuffix(".shp") + ".dbf")
      val defs = readDbfFieldDefs(dbfBytes)
      require(defs.toSeq == headerDefsSeq,
        s"$shp: attribute schema differs from $firstShp — mixed-schema directories cannot union")
      val geoms = parseShpRecords(taskBytes(shp))
      val attrs = parseDbfRecords(dbfBytes, defs)
      require(geoms.size == attrs.size,
        s"$shp: ${geoms.size} shapes but ${attrs.size} dBASE records")
      geoms.iterator.zip(attrs.iterator).collect {
        // a '*'-deleted dBASE record still owns its ordinal .shp twin —
        // both drop together
        case (g, Some(vals)) =>
          val wkb: Any = if (g == null) null else GeomOps.toWkb(g)
          Row.fromSeq(wkb +: vals)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Field descriptors from a .dbf header: (name, type, len, dec). */
  private def readDbfFieldDefs(bytes: Array[Byte]): Array[(String, Char, Int, Int)] = {
    require(bytes.length >= 33, "truncated dBASE file")
    val defs = scala.collection.mutable.ArrayBuffer.empty[(String, Char, Int, Int)]
    var off = 32
    while (off + 32 <= bytes.length && bytes(off) != 0x0d) {
      val nameEnd = (off until off + 11).find(bytes(_) == 0).getOrElse(off + 11)
      val name = new String(bytes, off, nameEnd - off, "ASCII")
      val kind = bytes(off + 11).toChar
      val len = bytes(off + 16) & 0xFF
      val dec = bytes(off + 17) & 0xFF
      defs += ((name, kind, len, dec))
      off += 32
    }
    defs.toArray
  }

  /** Attribute rows from a .dbf, ordinal order; None for '*'-deleted
    * records. */
  private def parseDbfRecords(bytes: Array[Byte],
                              defs: Array[(String, Char, Int, Int)]): Seq[Option[Seq[Any]]] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xFFFF
    val recSize = bb.getShort(10) & 0xFFFF
    (0 until nRecords).map { r =>
      val base = headerSize + r * recSize
      require(base + recSize <= bytes.length, s"truncated dBASE record $r")
      if (bytes(base) == '*') None
      else Some {
        var off = base + 1
        defs.toSeq.map { case (_, kind, len, dec) =>
          val raw = new String(bytes, off, len, "ASCII")
          off += len
          val t = raw.trim
          if (t.isEmpty) null
          else kind match {
            case 'N' if dec == 0 => java.lang.Long.valueOf(t)
            case 'N' | 'F' => java.lang.Double.valueOf(t)
            case 'L' => java.lang.Boolean.valueOf(t == "T" || t == "t" || t == "Y" || t == "y")
            case _ => t
          }
        }
      }
    }
  }

  /** Geometries from a .shp in record order (null for null shapes). */
  private def parseShpRecords(bytes: Array[Byte]): Seq[Geometry] = {
    val f = GeomOps.factory
    val out = scala.collection.mutable.ArrayBuffer.empty[Geometry]
    var off = 100 // past the main header
    while (off + 8 <= bytes.length) {
      val head = ByteBuffer.wrap(bytes, off, 8).order(ByteOrder.BIG_ENDIAN)
      head.getInt // record number
      val contentWords = head.getInt
      val b = ByteBuffer.wrap(bytes, off + 8, contentWords * 2).order(ByteOrder.LITTLE_ENDIAN)
      out += (b.getInt match {
        case 0 => null
        case 1 => f.createPoint(new Coordinate(b.getDouble, b.getDouble))
        case 8 =>
          b.position(b.position() + 32) // bbox
          val n = b.getInt
          f.createMultiPointFromCoords(Array.fill(n)(new Coordinate(b.getDouble, b.getDouble)))
        case t @ (3 | 5) =>
          b.position(b.position() + 32) // bbox
          val nParts = b.getInt; val nPts = b.getInt
          val starts = Array.fill(nParts)(b.getInt)
          val coords = Array.fill(nPts)(new Coordinate(b.getDouble, b.getDouble))
          val parts = starts.indices.map { i =>
            val end = if (i + 1 < nParts) starts(i + 1) else nPts
            coords.slice(starts(i), end)
          }
          if (t == 3) {
            val lines = parts.map(f.createLineString)
            if (lines.size == 1) lines.head else f.createMultiLineString(lines.toArray)
          } else assemblePolygons(parts)
        case other => throw new IllegalArgumentException(s"unsupported shape type $other")
      })
      off += 8 + contentWords * 2
    }
    out.toSeq
  }

  /** ESRI winding reassembly: clockwise rings are shells, counter-
    * clockwise rings are holes of the shell that contains them (a hole
    * no shell contains is kept as its own shell — lenient toward
    * writers that break the winding rule). */
  private def assemblePolygons(parts: Seq[Array[Coordinate]]): Geometry = {
    val f = GeomOps.factory
    val rings = parts.map(f.createLinearRing)
    val (holes0, shells0) = rings.partition(r => Orientation.isCCW(r.getCoordinates))
    val (shells, holes) =
      if (shells0.isEmpty) (holes0, Seq.empty[LinearRing]) else (shells0, holes0)
    val shellPolys = shells.map(s => f.createPolygon(s))
    val grouped = holes.groupBy { h =>
      val p = f.createPoint(h.getCoordinateN(0))
      shellPolys.indexWhere(_.covers(p))
    }
    val polys = shellPolys.indices.map { i =>
      f.createPolygon(shells(i), grouped.getOrElse(i, Seq.empty).toArray)
    } ++ grouped.getOrElse(-1, Seq.empty).map(h => f.createPolygon(h))
    if (polys.size == 1) polys.head else f.createMultiPolygon(polys.toArray)
  }

  /** dBASE 'N' rendering — Locale.ROOT ('.' decimals regardless of the
    * JVM locale). Never silently truncates: fixed-point first, then
    * scientific at decreasing precision, then a hard error. */
  private def formatNumeric(d: Double, len: Int, dec: Int): String = {
    val fixed =
      if (dec == 0) String.format(java.util.Locale.ROOT, "%d", Long.box(d.toLong))
      else String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(d))
    if (fixed.length <= len) fixed
    else {
      var p = math.max(0, len - 7) // sign + mantissa digit + '.' + 'e+XXX'
      var s = String.format(java.util.Locale.ROOT, s"%.${p}e", Double.box(d))
      while (s.length > len && p > 0) {
        p -= 1
        s = String.format(java.util.Locale.ROOT, s"%.${p}e", Double.box(d))
      }
      require(s.length <= len,
        s"numeric value $d does not fit dBASE 'N' field of width $len")
      s
    }
  }
}
