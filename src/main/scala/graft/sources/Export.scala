package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.functions.StFunctions

/**
 * Export sinks — the engine's analog of the reference's exporter family
 * (geomesa-tools/.../export/formats: Delimited, GeoJson, Avro, Bin,
 * Arrow, Shapefile). Spark-native: every format is a projection plus a
 * built-in writer, so exports scale exactly like any other job.
 *
 *  - CSV/TSV: geometry rendered as WKT, df.write.csv
 *  - GeoJSON: one Feature per line (RFC 7946 geometry via st_asGeoJSON,
 *    properties from the remaining columns), text write — line-delimited
 *    GeoJSON, the standard big-data framing
 *  - BIN: the 16-byte (trackHash,dtgSecs,lat,lon) records as Parquet
 *    (Stats.binRecords does the packing projection); the byte-exact
 *    16/24-byte `.bin` wire files are written by BinExport
 *  - Arrow: real IPC files via the Arrow Java libraries Spark ships —
 *    see ArrowExport (one .arrow file per partition, pyarrow-readable)
 *  - Shapefile: .shp/.shx/.dbf (Point/MultiPoint/PolyLine/Polygon) from
 *    the published ESRI spec — see Shapefile (bounded interchange
 *    export, like the reference's tools module)
 *  - Avro: Object Container Files via the stock Apache Avro library
 *    (spark-avro is not on this classpath) — see AvroExport
 *  - GML: WFS 1.0 / GML 2 FeatureCollection documents, one per
 *    partition — see Gml
 *  - Leaflet: self-contained index.html (GeoJSON layer + heat layer),
 *    bounded visualization like the reference's LeafletMapExporter —
 *    see Leaflet
 */
object Export {

  /** CSV with WKT geometry. */
  def csv(df: DataFrame, geomCol: String, path: String, delimiter: String = ","): Unit =
    df.withColumn(geomCol, StFunctions.stAsText(col(geomCol)))
      .write.mode(SaveMode.Overwrite)
      .option("header", "true").option("delimiter", delimiter)
      .csv(path)

  /** Line-delimited GeoJSON features. */
  def geoJson(df: DataFrame, geomCol: String, path: String): Unit = {
    val props = df.columns.filterNot(_ == geomCol)
    val propsJson = to_json(struct(props.map(col): _*))
    df.select(concat(
        lit("""{"type":"Feature","geometry":"""),
        StFunctions.stAsGeoJSON(col(geomCol)),
        lit(""","properties":"""), propsJson, lit("}")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Packed BIN records (Parquet columnar framing of the 16-byte layout). */
  def bin(df: DataFrame, trackCol: String, millisCol: String,
          lonCol: String, latCol: String, path: String): Unit =
    graft.operators.Stats.binRecords(df, trackCol, millisCol, lonCol, latCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
