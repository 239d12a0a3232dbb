package graft.table

import java.util.UUID
import graft.cells.{BinnedTime, Cells}

/**
 * Z3-sorted feature ids — the reference's Z3UuidGenerator layout
 * (geomesa-utils/.../uuid/Z3FeatureIdGenerator.scala:37-123): version-4,
 * IETF-variant UUIDs whose most-significant half packs
 *
 *   [4-bit shard | 44 z3 bits | 4-bit version | 12 z3 bits]
 *
 * over the big-endian (bin: Short, z3: Long) key, with 62 random bits
 * in the least-significant half. Ids of spatiotemporally-near rows
 * share prefixes — an id-sorted storage layout doubles as a coarse
 * spatial layout — while the shard nibble spreads hot regions across
 * 16 prefixes (the same salting idea as SpatialTable's shard column).
 */
object Z3Uuid {

  private val random = new java.security.SecureRandom()

  /** Random-LSB id (the production form). */
  def apply(lon: Double, lat: Double, millis: Long,
            period: BinnedTime.Period = BinnedTime.Week): UUID = {
    val bytes = new Array[Byte](8)
    random.nextBytes(bytes)
    var lsb = 0L
    var i = 0
    while (i < 8) { lsb = (lsb << 8) | (bytes(i) & 0xffL); i += 1 }
    withLsb(lon, lat, millis, period, lsb)
  }

  /** Deterministic-LSB variant (tests, reproducible pipelines). The
    * variant bits of `lsb` are forced to IETF regardless of input. */
  def withLsb(lon: Double, lat: Double, millis: Long, period: BinnedTime.Period,
              lsb: Long): UUID =
    new UUID(msb(lon, lat, millis, period), (lsb & ~(3L << 62)) | (1L << 63))

  /** The deterministic (z3-derived) most-significant half. */
  def msb(lon: Double, lat: Double, millis: Long, period: BinnedTime.Period): Long = {
    val (bin, z) = Cells.z3(lon, lat, millis, period)
    val zb = new Array[Byte](10)
    zb(0) = (bin >> 8).toByte
    zb(1) = bin.toByte
    var i = 0
    while (i < 8) { zb(2 + i) = (z >>> (8 * (7 - i))).toByte; i += 1 }
    val shard = math.abs(scala.util.hashing.MurmurHash3.bytesHash(zb) % 16).toByte
    // nibble-shift the first 7 z3 bytes down past the shard; the byte
    // promotion semantics ((b << 4) | (b >>> 4) on sign-extended Ints,
    // truncated back to Byte) are the reference's exact bit behavior
    def lohi(b1: Byte, b2: Byte): Byte = ((b1 << 4) | (b2 >>> 4)).toByte
    val m = new Array[Byte](8)
    m(0) = lohi(shard, zb(0))
    m(1) = lohi(zb(0), zb(1))
    m(2) = lohi(zb(1), zb(2))
    m(3) = lohi(zb(2), zb(3))
    m(4) = lohi(zb(3), zb(4))
    m(5) = lohi(zb(4), zb(5))
    m(6) = lohi(0, (zb(5) << 4).toByte)
    m(7) = zb(6)
    m(6) = ((m(6) & 0x0f) | 0x40).toByte // version 4
    var out = 0L
    i = 0
    while (i < 8) { out = (out << 8) | (m(i) & 0xffL); i += 1 }
    out
  }

  /** The shard nibble of an existing id (for pre-split routing). */
  def shard(id: UUID): Byte = ((id.getMostSignificantBits >>> 60) & 0xf).toByte

  /** Ingest-time-sorted ids — the reference's TimeSortedUuidGenerator
    * (geomesa-utils/.../uuid/IngestTimeFeatureIdGenerator.scala:36-73):
    * the msb packs epoch millis big-endian (top 4 bits dropped, 4 bits
    * yielded to the version nibble) so ids sort by ingest time; the lsb
    * is random with the IETF variant. Negative times unsupported, like
    * the reference. */
  def timeSorted(millis: Long = System.currentTimeMillis()): UUID =
    timeSortedWithLsb(millis, {
      val bytes = new Array[Byte](8)
      random.nextBytes(bytes)
      var lsb = 0L
      var i = 0
      while (i < 8) { lsb = (lsb << 8) | (bytes(i) & 0xffL); i += 1 }
      lsb
    })

  /** Deterministic-LSB variant (tests, reproducible pipelines). */
  def timeSortedWithLsb(millis: Long, lsb: Long): UUID =
    new UUID(timeSortedMsb(millis), (lsb & ~(3L << 62)) | (1L << 63))

  def timeSortedMsb(millis: Long): Long = {
    require(millis >= 0, "negative time values are not supported")
    (((millis >> 52) & 0xffL) << 56) |
      (((millis >> 44) & 0xffL) << 48) |
      (((millis >> 36) & 0xffL) << 40) |
      (((millis >> 28) & 0xffL) << 32) |
      (((millis >> 20) & 0xffL) << 24) |
      (((millis >> 12) & 0xffL) << 16) |
      ((((millis >> 8) & 0x0fL) | 0x40L) << 8) | // version nibble = 4
      (millis & 0xffL)
  }
}
