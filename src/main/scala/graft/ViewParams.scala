package graft

import scala.util.control.NonFatal

/** GeoServer view-parameter translation — the reference's ViewParams
  * (geomesa-index-api/.../geoserver/ViewParams.scala:29-120): the only
  * way GeoServer exposes per-request options to the store is a
  * `viewparams` string map, which the reference converts into typed
  * query hints. Here the behavioral hints land directly on a
  * [[GraftQuery]] (density / stats / BIN / sampling — the hints the
  * runner executes); hints that are advisory in this engine (index
  * choice is rule- and pushdown-driven, stats come back as rows rather
  * than encoded blobs) are parsed with the reference's exact typed
  * conversions and returned in `advisory` so a caller can still see
  * them; unknown or unparseable params land in `ignored`, mirroring the
  * reference's log-and-skip behavior rather than failing the query. */
object ViewParams {

  final case class Parsed(query: GraftQuery,
                          advisory: Map[String, Any],
                          ignored: Map[String, String])

  // the reference's envelope literal: "[minX, minY, maxX, maxY]"
  private val EnvelopeRx =
    """\[\s*(-?\d+(\.\d+)?),\s*(-?\d+(\.\d+)?),\s*(-?\d+(\.\d+)?),\s*(-?\d+(\.\d+)?)\s*]""".r

  /** Advisory hints and their value types (reference QueryHints.scala).
    * COST_EVALUATION normalizes to its enum's lowercase names. */
  private val AdvisoryTyped: Map[String, String => Any] = Map(
    "QUERY_INDEX" -> identity,
    "COST_EVALUATION" -> { v =>
      v.toLowerCase match {
        case c @ ("stats" | "index") => c
        case other => throw new IllegalArgumentException(s"unknown cost evaluation: $other")
      }
    },
    "ENCODE_STATS" -> parseBoolean,
    "EXACT_COUNT" -> parseBoolean,
    "LOOSE_BBOX" -> parseBoolean,
    "MAP_AGGREGATION" -> identity,
    "ARROW_ENCODE" -> parseBoolean,
    "BIN_LABEL" -> identity,
    "BIN_SORT" -> parseBoolean,
    "BIN_BATCH_SIZE" -> (v => v.trim.toInt))

  private def parseBoolean(v: String): Any = v.trim.toLowerCase match {
    case "true" => true
    case "false" => false
    case other => throw new IllegalArgumentException(s"not a boolean: $other")
  }

  /** Translate a view-params map (keys are uppercase, as GeoServer
    * always sends them) over a base query. "STRATEGY" aliases
    * "QUERY_INDEX" exactly like the reference (ViewParams.scala:69). */
  def parse(params: Map[String, String], base: GraftQuery = GraftQuery()): Parsed = {
    var q = base
    val advisory = Map.newBuilder[String, Any]
    val ignored = Map.newBuilder[String, String]

    // density params compose into ONE hint, like DENSITY_BBOX/WIDTH/
    // HEIGHT/WEIGHT compose on the reference's Query
    def density: DensityHint = q.density.getOrElse(DensityHint(bbox = (-180, -90, 180, 90)))
    def bin(track: String = null): BinHint =
      q.binTrack.getOrElse(BinHint(track = track, dtg = "dtg"))

    params.foreach { case (original, value) =>
      val key = if (original == "STRATEGY") "QUERY_INDEX" else original
      try {
        key match {
          case "DENSITY_BBOX" => value.trim match {
            case EnvelopeRx(x0, _, y0, _, x1, _, y1, _) =>
              q = q.copy(density = Some(density.copy(
                bbox = (x0.toDouble, y0.toDouble, x1.toDouble, y1.toDouble))))
            case other => throw new IllegalArgumentException(s"not an envelope: $other")
          }
          case "DENSITY_WIDTH" => q = q.copy(density = Some(density.copy(width = value.trim.toInt)))
          case "DENSITY_HEIGHT" => q = q.copy(density = Some(density.copy(height = value.trim.toInt)))
          case "DENSITY_WEIGHT" => q = q.copy(density = Some(density.copy(weight = Some(value))))
          case "STATS_STRING" => q = q.copy(statsString = Some(value))
          case "SAMPLING" => q = q.copy(sampling = Some(value.trim.toDouble))
          case "SAMPLE_BY" => q = q.copy(sampleBy = Some(value))
          case "BIN_TRACK" => q = q.copy(binTrack = Some(bin(value).copy(track = value)))
          case "BIN_DTG" => q = q.copy(binTrack = Some(bin().copy(dtg = value)))
          case _ => AdvisoryTyped.get(key) match {
            case Some(convert) => advisory += key -> convert(value)
            case None => ignored += original -> value
          }
        }
      } catch {
        // the reference logs and skips a hint whose value fails its
        // typed conversion (ViewParams.scala:83-85)
        case NonFatal(_) => ignored += original -> value
      }
    }
    val parsed = q
    if (parsed.binTrack.exists(_.track == null))
      Parsed(parsed.copy(binTrack = None), advisory.result(),
        ignored.result() + ("BIN_DTG" -> params.getOrElse("BIN_DTG", "")))
    else Parsed(parsed, advisory.result(), ignored.result())
  }
}
