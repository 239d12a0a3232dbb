package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.StFunctions
import graft.geom.{GeoJson, GeomOps => G}

/**
 * GeoJSON document store + MongoDB-style query language — the Spark
 * analog of the reference's geomesa-geojson module (geomesa-geojson/
 * geomesa-geojson-api/.../query/GeoJsonQuery.scala:29-49: store raw
 * GeoJSON features, query them with JSON predicates instead of CQL).
 *
 * Query syntax (same constructs as the reference):
 * {{{
 *   {}                                        all features
 *   { "foo": "bar" }                          property equality
 *   { "foo": { "$lt": 10 } }                  $lt/$lte/$gt/$gte
 *   { "geometry": { "$bbox": [x0,y0,x1,y1] } }
 *   { "geometry": { "$intersects": { "$geometry": {geojson} } } }
 *   { "geometry": { "$within":     { "$geometry": {geojson} } } }
 *   { "geometry": { "$contains":   { "$geometry": {geojson} } } }
 *   { "geometry": { "$dwithin":    { "$geometry": …, "$dist": d, "$unit": "meters" } } }
 *   { "$or": [ q1, q2 ] }    and implicit AND of sibling keys
 * }}}
 *
 * Spark-first shape: the whole query compiles to ONE Column predicate —
 * property access is `get_json_object` (codegen'd path extraction, no
 * UDF), spatial predicates are the st_* surface over the parsed WKB
 * geometry, and the literal query geometry is parsed ONCE on the driver
 * and shipped as a WKB literal. Catalyst therefore sees an ordinary
 * conjunctive filter: it pipelines into whole-stage codegen and prunes
 * columns like any hand-written `where`, instead of the reference's
 * per-document JSON-path evaluation inside a custom datastore.
 */
object GeoJsonQuery {

  private val mapper = new ObjectMapper()

  /** Parse line-delimited GeoJSON features (the framing Export.geoJson
    * writes) into a geometry WKB column + the properties document. */
  def parse(df: DataFrame, lineCol: String = "value", geomCol: String = "geometry"): DataFrame =
    df.select(
      StFunctions.stGeomFromGeoJSON(get_json_object(col(lineCol), "$.geometry")).as(geomCol),
      get_json_object(col(lineCol), "$.properties").as("properties"))

  /** Read a directory of line-delimited GeoJSON. */
  def read(spark: SparkSession, path: String, geomCol: String = "geometry"): DataFrame =
    parse(spark.read.text(path), "value", geomCol)

  /** Filter a parsed GeoJSON DataFrame with a query document. */
  def query(df: DataFrame, queryJson: String,
            geomCol: String = "geometry", propsCol: String = "properties"): DataFrame =
    df.where(compile(queryJson, geomCol, propsCol))

  /** Compile a query document to a single Column predicate. */
  def compile(queryJson: String, geomCol: String = "geometry",
              propsCol: String = "properties"): Column = {
    val root = mapper.readTree(queryJson)
    require(root != null && root.isObject, s"query must be a JSON object: $queryJson")
    evalObj(root, col(geomCol), col(propsCol), geomCol)
  }

  private def evalObj(n: JsonNode, geom: Column, props: Column, geomName: String): Column = {
    val fields = n.properties().asScala.toSeq.map(e => (e.getKey, e.getValue))
    if (fields.isEmpty) lit(true)
    else fields.map {
      case ("$or", arr) =>
        require(arr.isArray && arr.size > 0, "$or needs a non-empty array")
        (0 until arr.size).map { i =>
          val el = arr.get(i)
          require(el.isObject, s"$$or elements must be query objects, got $el")
          evalObj(el, geom, props, geomName)
        }.reduce(_ || _)
      case (op, _) if op.startsWith("$") && !op.startsWith("$.") => // "$.x" is a json-path prop
        throw new IllegalArgumentException(s"unsupported operator '$op'")
      case (prop, v) if v.isObject && v.properties().asScala.exists(_.getKey.startsWith("$")) =>
        // operator object: EVERY operator applies (e.g. {"$gte":5,"$lt":10})
        v.properties().asScala.toSeq
          .map(e => predicate(prop, e.getKey, e.getValue, geom, props, geomName))
          .reduce(_ && _)
      case (prop, v) if v.isObject || v.isArray =>
        throw new IllegalArgumentException(
          s"equality on '$prop' needs a scalar value (or an operator object), got $v")
      case (prop, v) => // plain equality
        propEquals(prop, v, props)
    }.reduce(_ && _)
  }

  private def propPath(prop: String): String =
    if (prop.startsWith("$.")) prop else "$." + prop

  private def propCol(prop: String, props: Column): Column =
    get_json_object(props, propPath(prop))

  /** Numeric compare: integral literals go through DECIMAL so 64-bit ids
    * above 2^53 compare exactly (the double path would collapse
    * neighboring ids onto the same value); floats keep IEEE semantics. */
  private def numCmp(extracted: Column, v: JsonNode,
                     f: (Column, Column) => Column): Column =
    if (v.isIntegralNumber)
      f(extracted.cast("decimal(38,15)"), lit(new java.math.BigDecimal(v.bigIntegerValue)))
    else f(extracted.cast("double"), lit(v.asDouble))

  private def propEquals(prop: String, v: JsonNode, props: Column): Column = {
    val extracted = propCol(prop, props)
    if (v.isNumber) numCmp(extracted, v, _ === _)
    else if (v.isBoolean) extracted === lit(v.asBoolean.toString)
    else extracted === lit(v.asText)
  }

  private def predicate(prop: String, op: String, v: JsonNode, geom: Column, props: Column,
                        geomName: String): Column = {
    def cmp(f: (Column, Column) => Column): Column =
      if (v.isNumber) numCmp(propCol(prop, props), v, f)
      else f(propCol(prop, props), lit(v.asText))
    def queryGeomWkb: Array[Byte] = {
      val g = Option(v.get("$geometry")).getOrElse(
        throw new IllegalArgumentException(s"$op needs a '$$geometry'"))
      G.toWkb(GeoJson.read(g.toString))
    }
    def spatial(f: (Column, Column) => Column): Column = {
      require(prop == geomName || prop == "geometry",
        s"spatial operator $op applies to the geometry member, got '$prop'")
      f(geom, lit(queryGeomWkb))
    }
    op match {
      case "$lt"  => cmp(_ < _)
      case "$lte" => cmp(_ <= _)
      case "$gt"  => cmp(_ > _)
      case "$gte" => cmp(_ >= _)
      case "$bbox" =>
        require(v.isArray && v.size == 4, "$bbox needs [xmin,ymin,xmax,ymax]")
        val Seq(x0, y0, x1, y1) = (0 until 4).map(v.get(_).asDouble)
        require(prop == geomName || prop == "geometry",
          s"$$bbox applies to the geometry member, got '$prop'")
        StFunctions.stIntersects(geom, lit(G.toWkb(G.bbox(x0, y0, x1, y1))))
      case "$intersects" => spatial(StFunctions.stIntersects(_, _))
      case "$within"     => spatial(StFunctions.stWithin(_, _))
      case "$contains"   => spatial(StFunctions.stContains(_, _))
      case "$dwithin" =>
        val dist = Option(v.get("$dist")).map(_.asDouble).getOrElse(
          throw new IllegalArgumentException("$dwithin needs '$dist'"))
        val meters = Option(v.get("$unit")).map(_.asText).getOrElse("meters") match {
          case "meters" => dist
          case "kilometers" => dist * 1000.0
          case "feet" => dist * 0.3048
          case "statute miles" => dist * 1609.344
          case u => throw new IllegalArgumentException(s"unknown $$dwithin unit '$u'")
        }
        require(prop == geomName || prop == "geometry",
          s"$$dwithin applies to the geometry member, got '$prop'")
        StFunctions.stDWithin(geom, lit(queryGeomWkb), lit(meters))
      case other => throw new IllegalArgumentException(s"invalid predicate '$other'")
    }
  }
}
