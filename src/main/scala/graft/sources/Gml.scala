package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.locationtech.jts.geom._
import org.locationtech.jts.io.WKBReader

/**
 * GML (WFS 1.0 / GML 2) export — the analog of the reference's
 * GmlExporter (geomesa-tools/.../export/formats/GmlExporter.scala:20,
 * which drives the GeoTools `GML(Version.WFS1_0)` encoder; output shape
 * verified against GmlExportTest.scala). GeoTools is not on this
 * classpath, so the documents are produced directly from the published
 * GML 2.1.2 schema: a `wfs:FeatureCollection` of `gml:featureMember`
 * elements, geometry as gml:Point/LineString/Polygon/Multi* with
 * `gml:coordinates` ("x,y x,y" framing), srsName EPSG:4326.
 *
 * Spark-native layout: one complete, standalone GML document per
 * partition (`part-NNNNN.gml`, attempt-private temp + rename + _SUCCESS
 * — the ArrowExport/AvroExport task-commit contract), so export
 * parallelism scales with the job, never through the driver.
 *
 * All non-geometry columns are rendered as child elements of the
 * feature (stringified, XML-escaped); null attributes are omitted —
 * the same projection rule as the reference's SimpleFeature encoding.
 */
object Gml {

  private val Srs = "http://www.opengis.net/gml/srs/epsg.xml#4326"

  private[sources] def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&apos;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def coords(cs: Array[Coordinate]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(' ')
      sb.append(cs(i).x).append(',').append(cs(i).y)
      i += 1
    }
    sb.toString
  }

  /** GML 2 geometry element for any JTS type (from the GML 2.1.2 spec's
    * geometry.xsd; same shapes the GeoTools WFS1_0 encoder emits). */
  private[sources] def geometryGml(g: Geometry): String = g match {
    case p: Point =>
      s"""<gml:Point srsName="$Srs"><gml:coordinates>${coords(p.getCoordinates)}</gml:coordinates></gml:Point>"""
    case l: LineString =>
      s"""<gml:LineString srsName="$Srs"><gml:coordinates>${coords(l.getCoordinates)}</gml:coordinates></gml:LineString>"""
    case p: Polygon =>
      val outer =
        s"<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>${coords(p.getExteriorRing.getCoordinates)}</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>"
      val inner = (0 until p.getNumInteriorRing).map { i =>
        s"<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>${coords(p.getInteriorRingN(i).getCoordinates)}</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>"
      }.mkString
      s"""<gml:Polygon srsName="$Srs">$outer$inner</gml:Polygon>"""
    case m: MultiPoint =>
      val members = (0 until m.getNumGeometries)
        .map(i => s"<gml:pointMember>${geometryGml(m.getGeometryN(i))}</gml:pointMember>").mkString
      s"""<gml:MultiPoint srsName="$Srs">$members</gml:MultiPoint>"""
    case m: MultiLineString =>
      val members = (0 until m.getNumGeometries)
        .map(i => s"<gml:lineStringMember>${geometryGml(m.getGeometryN(i))}</gml:lineStringMember>").mkString
      s"""<gml:MultiLineString srsName="$Srs">$members</gml:MultiLineString>"""
    case m: MultiPolygon =>
      val members = (0 until m.getNumGeometries)
        .map(i => s"<gml:polygonMember>${geometryGml(m.getGeometryN(i))}</gml:polygonMember>").mkString
      s"""<gml:MultiPolygon srsName="$Srs">$members</gml:MultiPolygon>"""
    case gc: GeometryCollection => // heterogeneous collection: GML 2 MultiGeometry
      val members = (0 until gc.getNumGeometries)
        .map(i => s"<gml:geometryMember>${geometryGml(gc.getGeometryN(i))}</gml:geometryMember>").mkString
      s"""<gml:MultiGeometry srsName="$Srs">$members</gml:MultiGeometry>"""
    case other => throw new IllegalArgumentException(
      s"GML export: unsupported geometry type ${other.getGeometryType}")
  }

  private val Header =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<wfs:FeatureCollection
      |    xmlns:wfs="http://www.opengis.net/wfs"
      |    xmlns:gml="http://www.opengis.net/gml"
      |    xmlns:graft="http://graft.example.org">
      |""".stripMargin

  /**
   * Write the DataFrame as a directory of GML documents. `geomCol` must
   * hold WKB (the engine's geometry representation); every other column
   * becomes a feature attribute element. `typeName` is the feature
   * element name (the reference's SimpleFeatureType name).
   */
  def write(df: DataFrame, geomCol: String, path: String, typeName: String = "feature",
            fidCol: Option[String] = None): Unit = {
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val fidIdx = fidCol.map(schema.fieldIndex)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
      .map { case (f, i) => (f.name, i) }
    val XmlName = "[A-Za-z_][A-Za-z0-9_.-]*"
    require(typeName.matches(XmlName), s"invalid GML type name '$typeName'")
    // unaliased expressions produce column names like "round(d, 3)" which
    // are not well-formed XML element names — fail here, not in a reader
    (attrs.map(_._1) :+ geomCol).foreach { name =>
      require(name.matches(XmlName),
        s"column name '$name' is not a valid XML element name — alias it before GML export")
    }

    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val conf = new Configuration()
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val finalPath = new Path(dir, f"part-$pid%05d.gml")
      val tmpPath = new Path(dir, f".part-$pid%05d-$attempt.gml.tmp")
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(tmpPath, true), java.nio.charset.StandardCharsets.UTF_8))
      val reader = new WKBReader()
      out.write(Header)
      try {
        it.foreach { row =>
          val fid = fidIdx.map(i => s""" fid="${escape(String.valueOf(row.get(i)))}"""").getOrElse("")
          out.write(s"  <gml:featureMember><graft:$typeName$fid>\n")
          attrs.foreach { case (name, i) =>
            if (!row.isNullAt(i)) // null attributes are omitted, as the reference encodes
              out.write(s"    <graft:$name>${escape(String.valueOf(row.get(i)))}</graft:$name>\n")
          }
          if (!row.isNullAt(geomIdx)) {
            val g = reader.read(row.getAs[Array[Byte]](geomIdx))
            out.write(s"    <graft:$geomCol>${geometryGml(g)}</graft:$geomCol>\n")
          }
          out.write(s"  </graft:$typeName></gml:featureMember>\n")
        }
        out.write("</wfs:FeatureCollection>\n")
      } finally out.close()
      // committed twin wins; a rename failure with NO twin fails the
      // task loudly instead of silently discarding the partition
      if (fs.exists(finalPath)) fs.delete(tmpPath, false)
      else if (!fs.rename(tmpPath, finalPath) && !fs.exists(finalPath))
        throw new java.io.IOException(s"Gml: failed to commit $tmpPath -> $finalPath")
      Iterator.empty[Int]
    }.count()
    val fs = new Path(path).getFileSystem(new Configuration())
    fs.create(new Path(path, "_SUCCESS"), true).close()
  }
}
