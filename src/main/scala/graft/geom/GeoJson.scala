package graft.geom

import org.locationtech.jts.geom._

/** Minimal GeoJSON geometry serializer + parser (RFC 7946) for
  * st_asGeoJSON / st_geomFromGeoJSON. The parser is the exact inverse of
  * `write` (JTS ships no GeoJSON IO on this classpath). */
object GeoJson {

  private val gf = new GeometryFactory()

  // one shared mapper: readTree is thread-safe, and constructing an
  // ObjectMapper per row would dominate the st_geomFromGeoJSON UDF
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse an RFC 7946 geometry object into JTS. */
  def read(json: String): Geometry = fromNode(mapper.readTree(json))

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): Geometry = {
    require(n != null && n.isObject, s"not a GeoJSON geometry object: $n")
    val typ = Option(n.get("type")).map(_.asText).getOrElse(
      throw new IllegalArgumentException("GeoJSON geometry needs a 'type'"))
    def arr(c: com.fasterxml.jackson.databind.JsonNode, what: String) = {
      require(c != null && c.isArray, s"GeoJSON $typ: '$what' must be an array, got $c")
      c
    }
    def cs = arr(n.get("coordinates"), "coordinates")
    def coord(c0: com.fasterxml.jackson.databind.JsonNode) = {
      val c = arr(c0, "position")
      require(c.size >= 2 && c.get(0).isNumber && c.get(1).isNumber,
        s"GeoJSON $typ: position must be [x, y], got $c")
      new Coordinate(c.get(0).asDouble, c.get(1).asDouble)
    }
    def line(c0: com.fasterxml.jackson.databind.JsonNode): Array[Coordinate] = {
      val c = arr(c0, "ring/line")
      (0 until c.size).map(i => coord(c.get(i))).toArray
    }
    def poly(c0: com.fasterxml.jackson.databind.JsonNode): Polygon = {
      val c = arr(c0, "polygon")
      require(c.size > 0, s"GeoJSON $typ: polygon needs at least one ring")
      val rings = (0 until c.size).map(i => gf.createLinearRing(line(c.get(i))))
      gf.createPolygon(rings.head, rings.tail.toArray)
    }
    typ match {
      case "Point" => gf.createPoint(coord(cs))
      case "LineString" => gf.createLineString(line(cs))
      case "Polygon" => poly(cs)
      case "MultiPoint" => gf.createMultiPointFromCoords(line(cs))
      case "MultiLineString" =>
        gf.createMultiLineString((0 until cs.size).map(i => gf.createLineString(line(cs.get(i)))).toArray)
      case "MultiPolygon" =>
        gf.createMultiPolygon((0 until cs.size).map(i => poly(cs.get(i))).toArray)
      case "GeometryCollection" =>
        val gs = arr(n.get("geometries"), "geometries")
        gf.createGeometryCollection((0 until gs.size).map(i => fromNode(gs.get(i))).toArray)
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }

  def write(g: Geometry): String = g match {
    case p: Point => s"""{"type":"Point","coordinates":${coord(p.getCoordinate)}}"""
    case l: LineString => s"""{"type":"LineString","coordinates":${coords(l.getCoordinates)}}"""
    case p: Polygon => s"""{"type":"Polygon","coordinates":${polyCoords(p)}}"""
    case m: MultiPoint =>
      s"""{"type":"MultiPoint","coordinates":[${children(m).map(c => coord(c.getCoordinate)).mkString(",")}]}"""
    case m: MultiLineString =>
      s"""{"type":"MultiLineString","coordinates":[${children(m).map(c => coords(c.getCoordinates)).mkString(",")}]}"""
    case m: MultiPolygon =>
      s"""{"type":"MultiPolygon","coordinates":[${children(m).collect { case p: Polygon => polyCoords(p) }.mkString(",")}]}"""
    case gc: GeometryCollection =>
      s"""{"type":"GeometryCollection","geometries":[${children(gc).map(write).mkString(",")}]}"""
    case other => throw new IllegalArgumentException(s"unsupported geometry: ${other.getGeometryType}")
  }

  private def children(g: Geometry): Seq[Geometry] =
    (0 until g.getNumGeometries).map(g.getGeometryN)

  private def num(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def coord(c: Coordinate): String = s"[${num(c.x)},${num(c.y)}]"
  private def coords(cs: Array[Coordinate]): String = cs.map(coord).mkString("[", ",", "]")
  private def polyCoords(p: Polygon): String = {
    val rings = p.getExteriorRing +: (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
    rings.map(r => coords(r.getCoordinates)).mkString("[", ",", "]")
  }
}
