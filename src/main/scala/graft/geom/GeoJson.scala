package graft.geom

import org.locationtech.jts.geom._

/** Minimal GeoJSON geometry serializer (RFC 7946) for st_asGeoJSON. */
object GeoJson {

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
