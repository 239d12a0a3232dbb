package graft.cells

/**
 * Bit-precision base-32 geohash — the reference's GeoHash
 * (geomesa-utils/.../geohash/GeoHash.scala) semantics rebuilt from the
 * published algorithm: precision is a BIT count (not a character
 * count), so 25/27/40/63-bit hashes are all valid; the hash string is
 * ceil(prec/5) characters with the bits past `prec` zeroed. Bits
 * interleave longitude-first (even positions lon, odd lat), msb at
 * position 0 — same convention as the reference's BitSet fixtures
 * (GeoHashTest.scala:48,60,88) and every public geohash description.
 *
 * The packed-Long cell algebra (Cells.scala) remains the engine's
 * native index; GeoHash is the interoperable text form the reference
 * exposes through st_geoHash and its GeoHash-based utilities.
 */
object GeoHash {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val MaxBits = 63

  /** An immutable geohash at `prec` bits. `bitset` holds the 0-based
    * positions of the SET bits among the first `prec` interleaved bits. */
  final case class GH(hash: String, prec: Int, bitset: Set[Int],
                      lonMin: Double, latMin: Double, lonMax: Double, latMax: Double) {
    /** Centroid of the cell rectangle. */
    def x: Double = (lonMin + lonMax) / 2
    def y: Double = (latMin + latMax) / 2
    def bbox: (Double, Double, Double, Double) = (lonMin, latMin, lonMax, latMax)

    def toBinaryString: String =
      (0 until prec).map(i => if (bitset(i)) '1' else '0').mkString

    /** Bit-prefix containment: a coarser hash contains a finer one iff
      * the finer's first `prec` bits equal this hash's bits. */
    def contains(other: GH): Boolean =
      prec <= other.prec &&
        (0 until prec).forall(i => bitset(i) == other.bitset(i))
  }

  /** Encode a point at `prec` bits (lon first, binary subdivision). */
  def apply(lon: Double, lat: Double, prec: Int): GH = {
    require(prec >= 1 && prec <= MaxBits, s"precision must be in [1, $MaxBits]: $prec")
    var lonMin = -180.0; var lonMax = 180.0
    var latMin = -90.0; var latMax = 90.0
    val set = Set.newBuilder[Int]
    var i = 0
    while (i < prec) {
      if (i % 2 == 0) {
        val mid = (lonMin + lonMax) / 2
        if (lon >= mid) { set += i; lonMin = mid } else lonMax = mid
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { set += i; latMin = mid } else latMax = mid
      }
      i += 1
    }
    val bits = set.result()
    GH(hashString(bits, prec), prec, bits, lonMin, latMin, lonMax, latMax)
  }

  /** Decode a hash string; `prec` defaults to all of its bits. */
  def apply(hash: String, prec: Int): GH = {
    require(prec >= 1 && prec <= math.min(MaxBits, hash.length * 5),
      s"precision $prec out of range for '$hash'")
    val bits = (for {
      (c, ci) <- hash.toLowerCase.zipWithIndex
      cd = Base32.indexOf(c)
      _ = require(cd >= 0, s"invalid geohash char: $c")
      b <- 0 until 5
      pos = ci * 5 + b
      if pos < prec && ((cd >> (4 - b)) & 1) == 1
    } yield pos).toSet
    fromBits(bits, prec)
  }

  def apply(hash: String): GH = apply(hash, hash.length * 5)

  /** Rebuild from set-bit positions (the reference's BitSet ctor). */
  def fromBits(bitset: Set[Int], prec: Int): GH = {
    require(bitset.forall(p => p >= 0 && p < prec), s"bit positions must be < $prec")
    var lonMin = -180.0; var lonMax = 180.0
    var latMin = -90.0; var latMax = 90.0
    var i = 0
    while (i < prec) {
      if (i % 2 == 0) {
        val mid = (lonMin + lonMax) / 2
        if (bitset(i)) lonMin = mid else lonMax = mid
      } else {
        val mid = (latMin + latMax) / 2
        if (bitset(i)) latMin = mid else latMax = mid
      }
      i += 1
    }
    GH(hashString(bitset, prec), prec, bitset, lonMin, latMin, lonMax, latMax)
  }

  /** Parse "01100101..." (msb first); precision = string length. */
  def fromBinaryString(s: String): GH =
    fromBits(s.zipWithIndex.collect { case ('1', i) => i }.toSet, s.length)

  /** Grid index of the latitude dimension: the odd-position bits as an
    * integer (floor(prec/2) of them, msb first). */
  def gridIndexForLatitude(gh: GH): Long = dimIndex(gh, lonDim = false)

  /** Grid index of the longitude dimension (ceil(prec/2) bits). */
  def gridIndexForLongitude(gh: GH): Long = dimIndex(gh, lonDim = true)

  def gridIndicesForLatLong(gh: GH): Array[Long] =
    Array(gridIndexForLatitude(gh), gridIndexForLongitude(gh))

  private def dimIndex(gh: GH, lonDim: Boolean): Long = {
    val start = if (lonDim) 0 else 1
    var v = 0L
    var i = start
    while (i < gh.prec) { v = (v << 1) | (if (gh.bitset(i)) 1L else 0L); i += 2 }
    v
  }

  /** Inverse of the grid indices: interleave latIdx/lonIdx back at
    * `prec` bits (lon gets ceil(prec/2) bits, lat floor(prec/2)). */
  def composeFromBitIndices(latIdx: Long, lonIdx: Long, prec: Int): GH = {
    val lonBits = (prec + 1) / 2
    val latBits = prec / 2
    val set = Set.newBuilder[Int]
    var i = 0
    while (i < lonBits) {
      if (((lonIdx >> (lonBits - 1 - i)) & 1L) == 1L) set += i * 2
      i += 1
    }
    i = 0
    while (i < latBits) {
      if (((latIdx >> (latBits - 1 - i)) & 1L) == 1L) set += i * 2 + 1
      i += 1
    }
    fromBits(set.result(), prec)
  }

  /** (latSpan, lonSpan): number of distinct grid rows/columns covered
    * between the lower-left and upper-right hashes at `prec` bits. */
  def latitudeLongitudeSpanCount(ll: GH, ur: GH, prec: Int): (Long, Long) = {
    val l = if (ll.prec == prec) ll else apply(ll.x, ll.y, prec)
    val u = if (ur.prec == prec) ur else apply(ur.x, ur.y, prec)
    (math.abs(gridIndexForLatitude(u) - gridIndexForLatitude(l)) + 1,
      math.abs(gridIndexForLongitude(u) - gridIndexForLongitude(l)) + 1)
  }

  /** All geohashes at `prec` bits whose CENTERS fall inside the
    * rectangle — the reference's RectangleGeoHashIterator
    * (geomesa-utils/.../geohash/RectangleGeoHashIterator.scala;
    * RectangleGeoHashIteratorTest): iterate the grid-index window
    * between the corners' hashes and keep center-in-rect cells, so an
    * exact parent bbox yields exactly the parent's children. */
  def rectangle(latLo: Double, lonLo: Double,
                latHi: Double, lonHi: Double, prec: Int): Seq[GH] = {
    require(latLo <= latHi && lonLo <= lonHi, "inverted rectangle")
    val ll = apply(lonLo, latLo, prec)
    val ur = apply(lonHi, latHi, prec)
    val (la0, la1) = (gridIndexForLatitude(ll), gridIndexForLatitude(ur))
    val (lo0, lo1) = (gridIndexForLongitude(ll), gridIndexForLongitude(ur))
    for {
      la <- la0 to la1
      lo <- lo0 to lo1
      gh = composeFromBitIndices(la, lo, prec)
      if gh.x >= lonLo && gh.x <= lonHi && gh.y >= latLo && gh.y <= latHi
    } yield gh
  }

  private def hashString(bitset: Set[Int], prec: Int): String = {
    val nChars = (prec + 4) / 5
    val sb = new StringBuilder(nChars)
    var ci = 0
    while (ci < nChars) {
      var v = 0
      var b = 0
      while (b < 5) {
        val pos = ci * 5 + b
        v = (v << 1) | (if (pos < prec && bitset(pos)) 1 else 0)
        b += 1
      }
      sb.append(Base32.charAt(v))
      ci += 1
    }
    sb.toString
  }
}
