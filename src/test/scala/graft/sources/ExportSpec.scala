package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.functions.StFunctions

class ExportSpec extends AnyFunSuite with SparkTest {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_export").toString

  test("CSV export renders WKT and round-trips through spark.read.csv") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("a", 1.0, 2.0), ("b", -3.5, 4.25)).toDF("id", "x", "y")
      .selectExpr("id", "st_makePoint(x, y) AS geom")
    val dir = tmp() + "/csv"
    Export.csv(df, "geom", dir)
    val back = spark.read.option("header", "true").csv(dir).collect()
    assert(back.length == 2)
    val wkts = back.map(r => (r.getString(0), r.getString(1))).toMap
    assert(wkts("a") == "POINT (1 2)" && wkts("b") == "POINT (-3.5 4.25)")
  }

  test("GeoJSON export emits parseable line-delimited features") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("a", 10.0, 20.0, 7)).toDF("id", "x", "y", "n")
      .selectExpr("id", "n", "st_makePoint(x, y) AS geom")
    val dir = tmp() + "/geojson"
    Export.geoJson(df, "geom", dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.length == 1)
    val parsed = spark.read.json(spark.createDataset(lines.toSeq)(org.apache.spark.sql.Encoders.STRING))
    val row = parsed.selectExpr("type", "geometry.type AS gt",
      "CAST(geometry.coordinates[0] AS DOUBLE) AS gx", "properties.id", "properties.n").head
    assert(row.getString(0) == "Feature" && row.getString(1) == "Point")
    assert(row.getDouble(2) == 10.0 && row.getString(3) == "a" && row.getLong(4) == 7)
  }

  test("Arrow IPC export round-trips all supported types (incl. WKB geometry + nulls)") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, 10, 1.5, 2.5f, "hello", true),
      (2L, 20, -3.25, 0.5f, "world", false),
      (3L, 30, 0.0, 1.0f, null.asInstanceOf[String], true)
    ).toDF("id", "n", "d", "f", "s", "b")
      .selectExpr("id", "n", "d", "f", "s", "b", "st_makePoint(d, d) AS geom")
      .repartition(2)
    val dir = tmp() + "/arrow"
    ArrowExport.write(df, dir, batchRows = 2)
    assert(new java.io.File(dir, "_SUCCESS").exists())
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".arrow")) == 2)
    val back = ArrowExport.read(spark, dir, df.schema)
    assert(back.schema == df.schema)
    val a = df.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }).toSet
    val b = back.collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }).toSet
    assert(a == b && a.size == 3)
  }

  test("Arrow dictionary encoding: global TopK-ordered dictionary, pyarrow-readable") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, Seq("png", "jpg", "webp")(i % 3), i * 1.5))
      .toDF("id", "fmt", "v").repartition(2)
    val dir = tmp() + "/arrowdict"
    val encoded = ArrowExport.write(df, dir, batchRows = 64, dictColumns = Seq("fmt"))
    assert(encoded == Set("fmt"))
    // JVM read decodes the dictionary back to strings
    val back = ArrowExport.read(spark, dir, df.schema)
    assert(back.groupBy("fmt").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("png" -> 100L, "jpg" -> 100L, "webp" -> 100L))
    // high-cardinality request falls back to plain UTF8 (lossless)
    val dir2 = tmp() + "/arrowdict2"
    val wide = (0 until 50).map(i => (i.toLong, s"val_$i")).toDF("id", "s")
    assert(ArrowExport.write(wide, dir2, dictColumns = Seq("s"), maxDictSize = 10).isEmpty)
    assert(ArrowExport.read(spark, dir2, wide.schema).count() == 50)
    // pyarrow (driver-side tooling) must see a dictionary-typed column;
    // skipped when pyarrow is not importable in this environment
    val probe = scala.sys.process.Process(Seq("python3", "-c", "import pyarrow")).!
    if (probe == 0) {
      val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
      val py =
        s"""import pyarrow.ipc as ipc
           |t = ipc.open_file('${f.getAbsolutePath}').read_all()
           |assert str(t.schema.field('fmt').type).startswith('dictionary'), t.schema
           |assert t.column('fmt').to_pylist().count('png') > 0
           |print('PYARROW_OK')""".stripMargin
      val outBuf = new StringBuilder
      val rc = scala.sys.process.Process(Seq("python3", "-c", py))
        .!(scala.sys.process.ProcessLogger(l => outBuf.append(l), l => outBuf.append(l)))
      assert(rc == 0 && outBuf.toString.contains("PYARROW_OK"), s"pyarrow check failed: $outBuf")
    } else cancel("pyarrow not available in this environment")
  }

  test("Arrow sorted-batch mode: global order, per-file order, reference metadata keys") {
    import spark.implicits._
    // deliberately unsorted, multi-partition input
    val df = (0 until 500).map(i => ((i * 7919) % 500L, s"row_$i"))
      .toDF("k", "s").repartition(4)
    val dir = tmp() + "/arrowsorted"
    ArrowExport.write(df, dir, batchRows = 32, sortBy = Some(("k", false)), sortPartitions = 4)
    // the reference's Metadata contract round-trips
    assert(ArrowExport.sortOf(dir).contains(("k", false)))
    // per-file: batches internally sorted; across files: globally ordered
    // by part id (range-partitioned sort)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow")).sortBy(_.getName)
    assert(files.length > 1, "want a multi-file export to prove global ordering")
    val keysByFile: Seq[Seq[Long]] = files.toSeq.map { f =>
      val one = tmp() + s"/one_${f.getName}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(one))
      java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(one, f.getName))
      ArrowExport.read(spark, one, df.schema).collect().map(_.getLong(0)).toSeq
    }
    keysByFile.foreach(ks => assert(ks == ks.sorted, "file not internally sorted"))
    val flat = keysByFile.flatten
    assert(flat == flat.sorted, "files not globally ordered by part id")
    assert(flat.size == 500 && flat.distinct.size == 500)
    // descending mode
    val dir2 = tmp() + "/arrowsorted_desc"
    ArrowExport.write(df, dir2, batchRows = 64, sortBy = Some(("k", true)))
    assert(ArrowExport.sortOf(dir2).contains(("k", true)))
    val back2 = ArrowExport.read(spark, dir2, df.schema).collect().map(_.getLong(0))
    assert(back2.sorted.toSeq == (0L until 500L))
    // unsorted export records no sort metadata
    assert(ArrowExport.sortOf(tmp_dirOf(df)).isEmpty)
  }

  private def tmp_dirOf(df: org.apache.spark.sql.DataFrame): String = {
    val d = tmp() + "/arrownosort"
    ArrowExport.write(df, d)
    d
  }

  test("Shapefile export: .shp/.shx/.dbf parse back per the ESRI spec") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("a", 3, 10.5, 45.25), ("b", 7, -120.0, -33.5))
      .toDF("name", "n", "x", "y")
      .selectExpr("name", "n", "st_makePoint(x, y) AS geom")
    val prefix = tmp() + "/pts"
    Shapefile.writePoints(df, "geom", prefix)

    import java.nio.{ByteBuffer, ByteOrder}
    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(prefix + ".shp"))
    val hb = ByteBuffer.wrap(shp)
    hb.order(ByteOrder.BIG_ENDIAN)
    assert(hb.getInt(0) == 9994, "file code")
    assert(hb.getInt(24) * 2 == shp.length, "file length in 16-bit words")
    hb.order(ByteOrder.LITTLE_ENDIAN)
    assert(hb.getInt(28) == 1000 && hb.getInt(32) == 1, "version + point type")
    assert(hb.getDouble(36) == -120.0 && hb.getDouble(52) == 10.5, "bbox x")
    // record 1: header 8B @100, then shapeType + x + y little-endian
    val rb = ByteBuffer.wrap(shp, 100, 28).order(ByteOrder.LITTLE_ENDIAN)
    rb.getInt(); rb.getInt() // record header (big-endian, skip)
    assert(rb.getInt() == 1)
    assert(rb.getDouble() == 10.5 && rb.getDouble() == 45.25)

    val shx = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(prefix + ".shx"))
    assert(shx.length == 100 + 2 * 8)
    val xb = ByteBuffer.wrap(shx, 100, 8).order(ByteOrder.BIG_ENDIAN)
    assert(xb.getInt() == 50 && xb.getInt() == 10, "first record offset/length in words")

    val dbf = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(prefix + ".dbf"))
    val db = ByteBuffer.wrap(dbf).order(ByteOrder.LITTLE_ENDIAN)
    assert(db.get(0) == 0x03, "dBASE III")
    assert(db.getInt(4) == 2, "record count")
    val headerSize = db.getShort(8)
    val recSize = db.getShort(10)
    val rec0 = new String(dbf, headerSize, recSize, "ASCII")
    // 'C' name field padded, integral 'N' field right-justified width 18
    assert(rec0.charAt(0) == ' ' && rec0.contains("a"))
    assert(rec0.endsWith(" " * 17 + "3"), s"integral N field: '$rec0'")
  }

  test("Shapefile export: polygons stream (no collect), ESRI winding, parse back") {
    StFunctions.register(spark)
    import spark.implicits._
    // polygon with a hole: shell CCW in WKT (must flip to CW), hole CW
    // in WKT (must flip to CCW)
    val df = Seq(
      ("poly1", 1.25,
        "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
      ("poly2", -2.5, "POLYGON((20 20, 30 20, 25 28, 20 20))")
    ).toDF("name", "v", "wkt")
      .selectExpr("name", "v", "st_geomFromWKT(wkt) AS geom")
      .repartition(2) // exercise the partition-at-a-time local iterator
    val prefix = tmp() + "/polys"
    Shapefile.write(df, "geom", prefix)

    import java.nio.{ByteBuffer, ByteOrder}
    val shp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(prefix + ".shp"))
    val hb = ByteBuffer.wrap(shp)
    hb.order(ByteOrder.BIG_ENDIAN)
    assert(hb.getInt(0) == 9994 && hb.getInt(24) * 2 == shp.length)
    hb.order(ByteOrder.LITTLE_ENDIAN)
    assert(hb.getInt(32) == 5, "polygon shape type")
    assert(hb.getDouble(36) == 0.0 && hb.getDouble(52) == 30.0, "global bbox x")

    // walk both records via the .shx index; identify by part/point counts
    val shx = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(prefix + ".shx"))
    assert(shx.length == 100 + 2 * 8)
    var sawHolePoly = false
    var sawTri = false
    (0 until 2).foreach { i =>
      val xb = ByteBuffer.wrap(shx, 100 + i * 8, 8).order(ByteOrder.BIG_ENDIAN)
      val off = xb.getInt() * 2
      val rb = ByteBuffer.wrap(shp, off + 8, shp.length - off - 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      assert(rb.getInt() == 5)
      rb.position(rb.position() + 32) // skip record bbox
      val nParts = rb.getInt(); val nPts = rb.getInt()
      if (nParts == 2) {
        sawHolePoly = true
        assert(nPts == 10, "5-pt shell + 5-pt hole")
        assert(rb.getInt() == 0 && rb.getInt() == 5, "part offsets")
        // shell must be CW per ESRI: signed area of first ring < 0
        val cs = Array.fill(5)((rb.getDouble(), rb.getDouble()))
        val area2 = cs.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
          x1 * y2 - x2 * y1 }.sum
        assert(area2 < 0, s"shell winding must be clockwise, area2=$area2")
      } else { sawTri = true; assert(nParts == 1 && nPts == 4) }
    }
    assert(sawHolePoly && sawTri)
  }

  test("Shapefile export: maxRows guard fails fast; mixed geometry types rejected") {
    StFunctions.register(spark)
    import spark.implicits._
    val big = spark.range(10).selectExpr("CAST(id AS STRING) AS name",
      "st_makePoint(CAST(id AS DOUBLE), 0.0) AS geom")
    val e = intercept[IllegalArgumentException] {
      Shapefile.write(big, "geom", tmp() + "/guard", maxRows = 5)
    }
    assert(e.getMessage.contains("capped"))
    val mixed = Seq(("a", "POINT(1 2)"), ("b", "POLYGON((0 0,1 0,1 1,0 0))"))
      .toDF("name", "wkt").selectExpr("name", "st_geomFromWKT(wkt) AS geom").coalesce(1)
    val e2 = intercept[IllegalArgumentException] {
      Shapefile.write(mixed, "geom", tmp() + "/mixed")
    }
    assert(e2.getMessage.contains("mixed geometry"))
  }

  test("Shapefile: integral dBASE columns are exact past 2^53 (no Double round-trip)") {
    StFunctions.register(spark)
    import spark.implicits._
    val big = 9007199254740993L // 2^53 + 1: corrupted if formatted via Double
    val df = Seq(("a", big), ("b", Long.MinValue)).toDF("name", "n")
      .selectExpr("name", "n", "st_makePoint(1.0, 2.0) AS geom")
    val prefix = tmp() + "/bigint"
    Shapefile.write(df, "geom", prefix)
    import java.nio.{ByteBuffer, ByteOrder}
    val dbf = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(prefix + ".dbf"))
    val db = ByteBuffer.wrap(dbf).order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = db.getShort(8)
    val recSize = db.getShort(10)
    val recs = (0 until 2).map(i => new String(dbf, headerSize + i * recSize, recSize, "ASCII"))
    assert(recs.exists(_.contains("9007199254740993")), recs)
    // Long.MinValue is exactly 20 chars — the widest value the field holds
    assert(recs.exists(_.contains("-9223372036854775808")), recs)
  }

  test("GML export rejects column names that are not XML element names") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, 1.5)).toDF("id", "v")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.col("v"), 3),
        org.apache.spark.sql.functions.expr("st_makePoint(v, v)").as("geom"))
    val e = intercept[IllegalArgumentException](Gml.write(df, "geom", tmp() + "/badname"))
    assert(e.getMessage.contains("XML element name"))
  }

  test("Avro export validates the codec on the driver before launching the job") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s")
    val e = intercept[IllegalArgumentException](AvroExport.write(df, tmp() + "/av", codec = "snappy"))
    assert(e.getMessage.contains("codec"))
  }

  test("BIN export writes the packed 4-column layout") {
    import spark.implicits._
    val df = Seq(("t1", 1700000000000L, 1.5, 2.5)).toDF("track", "millis", "lon", "lat")
    val dir = tmp() + "/bin"
    Export.bin(df, "track", "millis", "lon", "lat", dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSeq == Seq("track_hash", "dtg_s", "lat", "lon"))
    assert(back.count() == 1)
  }

  test("GML export writes well-formed WFS FeatureCollections parsed back by the JDK") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, "a&b<c>", "POINT (10 20)"),
      (2L, null.asInstanceOf[String], "LINESTRING (0 0, 1 1, 2 0)"),
      (3L, "poly", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
      (4L, "multi", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"))
      .toDF("id", "name", "wkt")
      .selectExpr("id", "name", "st_geomFromWKT(wkt) AS geom")
      .repartition(2)
    val dir = tmp() + "/gml"
    Gml.write(df, "geom", dir, typeName = "obs", fidCol = Some("id"))
    assert(new java.io.File(dir, "_SUCCESS").exists())
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gml"))
    assert(files.length == 2)
    // every part file is a standalone well-formed XML document
    val docs = files.map { f =>
      javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder().parse(f)
    }
    def all(tag: String): Seq[org.w3c.dom.Element] = docs.flatMap { d =>
      val ns = d.getElementsByTagName(tag)
      (0 until ns.getLength).map(ns.item(_).asInstanceOf[org.w3c.dom.Element])
    }
    assert(all("gml:featureMember").size == 4)
    assert(all("graft:obs").map(_.getAttribute("fid")).toSet == Set("1", "2", "3", "4"))
    // XML escaping round-trips through a real parser
    assert(all("graft:name").map(_.getTextContent).toSet == Set("a&b<c>", "poly", "multi"))
    // null attribute omitted: feature 2 has no name element
    assert(all("graft:name").size == 3)
    // geometry encodings: point coords, polygon inner ring, multipolygon members
    assert(all("gml:Point").head.getTextContent.trim == "10.0,20.0")
    assert(all("gml:innerBoundaryIs").size == 1)
    assert(all("gml:polygonMember").size == 2)
    // heterogeneous GeometryCollection encodes as GML 2 MultiGeometry
    val gcDir = tmp() + "/gc"
    Gml.write(df.limit(1).selectExpr("id",
      "st_geomFromWKT('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))') AS geom"),
      "geom", gcDir)
    val gcDoc = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.File(gcDir).listFiles().filter(_.getName.endsWith(".gml")).head)
    assert(gcDoc.getElementsByTagName("gml:MultiGeometry").getLength == 1)
    assert(gcDoc.getElementsByTagName("gml:geometryMember").getLength == 2)
  }

  test("Leaflet export writes a bounded self-contained html map") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, 10.0, 20.0), (2L, 10.0, 20.0), (3L, -30.0, 40.0))
      .toDF("id", "x", "y").selectExpr("id", "st_makePoint(x, y) AS geom")
    val file = tmp() + "/index.html"
    Leaflet.write(df, "geom", file)
    val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(html.contains("L.geoJSON") && html.contains("L.heatLayer"))
    // all three features embedded; duplicate coordinate gets max heat weight 1.0
    assert("\"type\":\"Feature\"".r.findAllIn(html).size == 3)
    assert(html.contains("[20.0,10.0,1.0]"))
    // the cap guards the driver
    val e = intercept[IllegalArgumentException](Leaflet.write(df, "geom", file, maxFeatures = 2))
    assert(e.getMessage.contains("bounded"))
  }

  test("Leaflet: </script> in a property cannot terminate the inline script; null geoms dropped") {
    StFunctions.register(spark)
    import spark.implicits._
    val payload = "</script><script>alert(1)"
    val df = Seq((1L, Some(payload), Some(10.0)), (2L, Some("ok"), None))
      .toDF("id", "note", "x")
      .selectExpr("id", "note",
        "CASE WHEN x IS NOT NULL THEN st_makePoint(x, x) END AS geom")
    val file = tmp() + "/esc.html"
    Leaflet.write(df, "geom", file)
    val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(!html.contains(payload), "raw </script> payload must not reach the document")
    assert(html.contains("\\u003c/script"), "the '<' must be JSON-escaped instead")
    // the null-geometry row is dropped rather than NPE-ing the export
    assert("\"type\":\"Feature\"".r.findAllIn(html).size == 1)
  }

  // ---- Shapefile READ (ingest direction — ShpIngestTest analog) ------

  test("Shapefile read: write -> read round-trips points, attrs, and nulls") {
    StFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("2011-01-01T00:00:00.000Z", 1L, 1.5, Some(10.0)),
      ("2012-01-01T00:00:00.000Z", 9007199254740995L, -2.25, None))
      .toDF("dtg", "n", "d", "x")
      .selectExpr("dtg", "n", "d",
        "CASE WHEN x IS NOT NULL THEN st_makePoint(x, 2 * x) ELSE st_makePoint(1.0, 2.0) END AS geom")
      .select("geom", "dtg", "n", "d")
    val prefix = tmp() + "/rt"
    Shapefile.write(df, "geom", prefix)
    val back = Shapefile.read(spark, prefix)
    assert(back.schema.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("geom", org.apache.spark.sql.types.BinaryType),
      ("dtg", org.apache.spark.sql.types.StringType),
      ("n", org.apache.spark.sql.types.LongType),
      ("d", org.apache.spark.sql.types.DoubleType)))
    val rows = back.collect().map(r =>
      (graft.geom.GeomOps.fromWkb(r.getAs[Array[Byte]](0)).toText,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows === Set(
      ("POINT (10 20)", "2011-01-01T00:00:00.000Z", 1L, 1.5),
      // integral dBASE values past 2^53 come back exact (Long path)
      ("POINT (1 2)", "2012-01-01T00:00:00.000Z", 9007199254740995L, -2.25)))
  }

  test("Shapefile read: polygons with holes, polylines, multipoints reassemble") {
    import spark.implicits._
    val reader = new org.locationtech.jts.io.WKTReader(graft.geom.GeomOps.factory)
    def wkb(wkt: String) = graft.geom.GeomOps.toWkb(reader.read(wkt))
    val cases = Seq(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), ((20 20, 25 20, 25 25, 20 25, 20 20), (21 21, 22 21, 22 22, 21 22, 21 21)))",
      "LINESTRING (0 0, 5 5, 10 0)",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOINT ((1 1), (2 2), (3 3))")
    for ((wkt, i) <- cases.zipWithIndex) {
      val prefix = tmp() + s"/geom$i"
      Shapefile.write(Seq((i.toLong, wkb(wkt))).toDF("id", "geom"), "geom", prefix)
      val back = Shapefile.read(spark, prefix).collect()
      assert(back.length === 1)
      val g = graft.geom.GeomOps.fromWkb(back.head.getAs[Array[Byte]]("geom"))
      val expected = reader.read(wkt)
      assert(g.norm().equalsExact(expected.norm()),
        s"case $i: ${g.toText} != $wkt")
      assert(back.head.getLong(1) === i.toLong)
    }
  }

  test("Shapefile read: a directory unions files; mixed schemas fail loudly") {
    StFunctions.register(spark)
    import spark.implicits._
    val dir = tmp() + "/corpus"
    new java.io.File(dir).mkdirs()
    def pointsDf(ids: Seq[Long]) =
      ids.toDF("id").selectExpr("st_makePoint(CAST(id AS DOUBLE), 0.0) AS geom", "id")
    Shapefile.write(pointsDf(Seq(1L, 2L)), "geom", s"$dir/a")
    Shapefile.write(pointsDf(Seq(3L)), "geom", s"$dir/b")
    val back = Shapefile.read(spark, dir)
    assert(back.rdd.getNumPartitions === 2, "one task per shapefile")
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))

    val other = Seq(("x", 1L)).toDF("name", "id")
      .selectExpr("st_makePoint(0.0, 0.0) AS geom", "name", "id")
    Shapefile.write(other, "geom", s"$dir/c")
    val e = intercept[org.apache.spark.SparkException](Shapefile.read(spark, dir).collect())
    assert(e.getMessage.contains("mixed-schema") ||
      Option(e.getCause).exists(_.getMessage.contains("mixed-schema")))
  }

  test("Shapefile read: null shapes read back as null geometry") {
    import spark.implicits._
    val prefix = tmp() + "/nulls"
    val df = Seq((1L, Option.empty[Array[Byte]]),
      (2L, Some(graft.geom.GeomOps.toWkb(graft.geom.GeomOps.factory.createPoint(
        new org.locationtech.jts.geom.Coordinate(5, 6)))))).toDF("id", "geom")
    Shapefile.write(df.select("geom", "id"), "geom", prefix)
    val back = Shapefile.read(spark, prefix).orderBy("id").collect()
    assert(back(0).isNullAt(0) && back(1).getAs[Array[Byte]](0) != null)
  }
}
