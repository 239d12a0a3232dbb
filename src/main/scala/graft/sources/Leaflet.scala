package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StFunctions

/**
 * Leaflet map export — the analog of the reference's LeafletMapExporter
 * (geomesa-tools/.../export/formats/LeafletMapExporter.scala: renders
 * exported features into a self-contained index.html with a Leaflet
 * GeoJSON layer + a density heat layer). Same intent here: a one-file
 * visual spot-check of a query result, NOT a data path.
 *
 * Scale posture: this is a driver-side bounded export by construction
 * (a browser page cannot render unbounded features), so it takes the
 * same guard Shapefile got after round 2 — a hard `maxFeatures` cap
 * checked with limit(n+1) BEFORE collecting, failing loudly instead of
 * OOMing the driver. The heat layer weights repeat coordinates the way
 * the reference's `normalizeValues` does (count per coordinate, scaled
 * to [0,1]).
 *
 * The HTML references the Leaflet assets from the standard unpkg CDN
 * (the reference bundles them from its jar's resources; there is no
 * bundled asset jar here). The GeoJSON payload is inline, so the file
 * is inspectable offline even if the map tiles are not reachable.
 */
object Leaflet {

  def write(df: DataFrame, geomCol: String, path: String, maxFeatures: Int = 10000): Unit = {
    val props = df.columns.filterNot(_ == geomCol)
    // null/EMPTY geometries have no place on a map: an empty geometry's
    // centroid has NaN coordinates, which would plant a bogus (0,0)
    // heat-layer point after rounding (Gml.write skips empties the same way)
    val features = df.where(col(geomCol).isNotNull &&
        !StFunctions.stIsEmpty(col(geomCol)))
      .withColumn("__c", StFunctions.stCentroid(col(geomCol)))
      .select(
        StFunctions.stAsGeoJSON(col(geomCol)).as("g"),
        to_json(struct(props.map(col): _*)).as("p"),
        StFunctions.stX(col("__c")).as("x"),
        StFunctions.stY(col("__c")).as("y"))
      .limit(maxFeatures + 1)
      .collect()
    require(features.length <= maxFeatures,
      s"Leaflet export is a bounded visualization format: result exceeds " +
        s"$maxFeatures features — aggregate or filter first (or raise maxFeatures)")

    // JSON-in-<script>: '<' must be escaped or a string property containing
    // "</script>" terminates the script element and injects markup
    def inlineJson(s: String): String = s.replace("<", "\\u003c")
    val geojson = features.iterator.map { r =>
      s"""{"type":"Feature","geometry":${inlineJson(r.getString(0))},"properties":${inlineJson(r.getString(1))}}"""
    }.mkString("[", ",\n", "]")

    // heat layer: weight = count per rounded coordinate, normalized to [0,1]
    val counts = features.iterator
      .map(r => (math.round(r.getDouble(2) * 1e5) / 1e5, math.round(r.getDouble(3) * 1e5) / 1e5))
      .toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val maxCount = if (counts.isEmpty) 1 else counts.values.max
    val heat = counts.iterator
      .map { case ((x, y), c) => s"[$y,$x,${c.toFloat / maxCount}]" }
      .mkString("[", ",", "]")

    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8"/><title>graft export</title>
         |<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
         |<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
         |<script src="https://unpkg.com/leaflet.heat@0.2.0/dist/leaflet-heat.js"></script>
         |<style>html,body,#map{height:100%;margin:0}</style></head>
         |<body><div id="map"></div><script>
         |var map = L.map('map');
         |L.tileLayer('https://{s}.tile.openstreetmap.org/{z}/{x}/{y}.png',
         |  {attribution: '&copy; OpenStreetMap contributors'}).addTo(map);
         |var features = {"type":"FeatureCollection","features":
         |$geojson
         |};
         |var layer = L.geoJSON(features, {onEachFeature: function (f, l) {
         |  // build the popup via textContent — string interpolation into
         |  // popup HTML would execute markup hidden in property VALUES
         |  var pre = document.createElement('pre');
         |  pre.textContent = JSON.stringify(f.properties, null, 2);
         |  l.bindPopup(pre); }}).addTo(map);
         |var heat = L.heatLayer($heat, {radius: 25}).addTo(map);
         |if (features.features.length > 0) { map.fitBounds(layer.getBounds()); }
         |else { map.setView([0, 0], 2); }
         |</script></body></html>
         |""".stripMargin

    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    out.write(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }
}
