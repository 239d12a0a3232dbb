package graft.cells

import graft.cells.GeoHash.GH

/**
 * GeoHash utilities used by the raster store's query planner — the
 * reference's GeohashUtils.getClosestAcceptableGeoHash
 * (geomesa-utils/.../geohash/GeohashUtils.scala:390-418),
 * TouchingGeoHashes (geomesa-process/.../knn/TouchingGeoHashes.scala)
 * and BoundingBox.getGeoHashesFromBoundingBox
 * (geomesa-utils/.../geohash/BoundingBox.scala:149-178) rebuilt over
 * this engine's bit-precision GeoHash (cells/GeoHash.scala).
 *
 * All functions are pure scalar math on the driver — they size the
 * PRUNING ranges of a raster query (a handful of hash prefixes), never
 * run per row.
 */
object GeoHashOps {

  /** log2-sum precision estimate of a bbox — GeohashUtils
    * .calculatePrecision:413-417 (round(log2(360/dx) + log2(180/dy))). */
  def calculatePrecision(minLon: Double, maxLon: Double,
                         minLat: Double, maxLat: Double): Int = {
    val dx = maxLon - minLon
    val dy = maxLat - minLat
    math.round(math.log(360 / dx) / math.log(2) +
      math.log(180 / dy) / math.log(2)).toInt
  }

  /**
   * The 32-bit-representable (5-bit character multiple) geohash closest
   * to the bbox extent, keyed by its centroid — GeohashUtils
   * .getClosestAcceptableGeoHash:397-410. None means "whole world"
   * (precision 0 or negative, or a sub-character precision <= 5 that
   * cannot round down to a full character).
   */
  def closestAcceptableGeoHash(minLon: Double, maxLon: Double,
                               minLat: Double, maxLat: Double): Option[GH] = {
    val prec = calculatePrecision(minLon, maxLon, minLat, maxLat)
    if (prec <= 0) None
    else {
      val cx = (minLon + maxLon) / 2
      val cy = (minLat + maxLat) / 2
      val gh = GeoHash(cx, cy, prec)
      prec % 5 match {
        case 0 => Some(gh)
        case _ if prec > 5 =>
          val chars = gh.hash.dropRight(1)
          Some(GeoHash(chars, chars.length * 5))
        case _ => None
      }
    }
  }

  /** Cell width in degrees at `prec` bits (lon gets ceil(prec/2) bits). */
  def lonDelta(prec: Int): Double = 360.0 / math.pow(2, (prec + 1) / 2)

  /** Cell height in degrees at `prec` bits (lat gets floor(prec/2) bits). */
  def latDelta(prec: Int): Double = 180.0 / math.pow(2, prec / 2)

  /**
   * All geohashes in contact with `gh` at the same precision —
   * TouchingGeoHashes.touching: the 8 compass neighbors stepped from
   * the centroid, antimeridian candidates mirrored across the dateline,
   * polar candidates expanded to the full ring of cells touching that
   * pole (TouchingGeoHashes.scala:32-88).
   */
  def touching(gh: GH): Set[GH] = {
    val dx = lonDelta(gh.prec)
    val dy = latDelta(gh.prec)
    val candidates = for {
      i <- Set(-1, 0, 1)
      j <- Set(-1, 0, 1)
    } yield (gh.x + i * dx, gh.y + j * dy)

    val idlSafe = candidates.map { case (x, y) =>
      if (math.abs(x) > 180.0) (x + degreesLonTranslation(x), y) else (x, y)
    }
    val polarSafe = idlSafe.flatMap { case (x, y) =>
      if (math.abs(y) > 90.0) polarCap(dx, gh.y) else Set((x, y))
    }
    polarSafe.map { case (x, y) => GeoHash(x, y, gh.prec) }.filterNot(_ == gh)
  }

  /** The dateline unwrap used throughout the reference
    * (TouchingGeoHashes.degreesLonTranslation). */
  def degreesLonTranslation(lon: Double): Double =
    (((lon + 180) / 360.0).floor * -360).toInt.toDouble

  /** Every cell center along the polar ring at the seed's latitude —
    * TouchingGeoHashes.polarCap:80-88. */
  private def polarCap(dx: Double, seedLat: Double): Set[(Double, Double)] = {
    val begin = -180.0 + 0.5 * dx
    val end = 180.0 - 0.5 * dx
    val steps = math.max(0, math.round((end - begin) / dx).toInt)
    (0 to steps).map(i => (begin + i * dx, seedLat)).toSet
  }

  /**
   * Budgeted cover of a bbox by geohash strings — the planner's
   * fallback when no closest-acceptable hash exists (BoundingBox
   * .getGeoHashesFromBoundingBox:158-178): start from the covering
   * hash (longest common character prefix of the corners), subdivide
   * into the 32 children intersecting the bbox, and recurse while
   * under `maxHashes`. An empty-string result element means "no common
   * prefix — the whole world".
   */
  def coverFromBBox(minLon: Double, maxLon: Double,
                    minLat: Double, maxLat: Double,
                    maxHashes: Int = 32, precChars: Int = 5): List[String] = {
    val llHash = GeoHash(minLon, minLat, precChars * 5).hash
    val urHash = GeoHash(maxLon - 1e-12, maxLat - 1e-12, precChars * 5).hash
    val common = llHash.zip(urHash).takeWhile { case (a, b) => a == b }.map(_._1).mkString

    def intersectsBox(g: GH): Boolean = {
      val (glo, gla, ghi, gha) = g.bbox
      glo < maxLon && ghi > minLon && gla < maxLat && gha > minLat
    }

    def children(prefix: String): List[GH] =
      "0123456789bcdefghjkmnpqrstuvwxyz".toList
        .map(c => GeoHash(prefix + c, (prefix.length + 1) * 5))
        .filter(intersectsBox)

    def expand(hashes: List[GH]): List[String] = {
      val next = hashes.flatMap(h => children(h.hash))
      if (next.isEmpty) hashes.map(_.hash)
      // budget: subdividing past maxHashes keeps the CURRENT level — a
      // coarser prefix set is a superset cover, never an overrun
      else if (next.size > maxHashes) hashes.map(_.hash)
      else if (next.head.hash.length < precChars) {
        val deeper = expand(next)
        if (deeper.size > maxHashes) next.map(_.hash) else deeper
      } else next.map(_.hash)
    }

    if (common.length >= precChars) List(common)
    else {
      val seed = if (common.isEmpty) children("") else List(GeoHash(common, common.length * 5))
      if (seed.isEmpty) List("") // degenerate bbox: fall back to a full scan
      else if (common.isEmpty && seed.size >= maxHashes) seed.map(_.hash)
      else expand(seed)
    }
  }
}
