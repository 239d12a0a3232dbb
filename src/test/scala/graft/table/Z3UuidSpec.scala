package graft.table

import org.scalatest.funsuite.AnyFunSuite
import graft.cells.BinnedTime

/** Ported from the reference's Z3FeatureIdGeneratorTest
  * (geomesa-utils/.../uuid/Z3FeatureIdGeneratorTest.scala:46-80):
  * the z3-derived most-significant half is asserted byte-for-byte. */
class Z3UuidSpec extends AnyFunSuite {

  private val time = 1435598908099L
  private val period = BinnedTime.Week

  test("point uuid has the reference's exact z3 prefix, version 4, IETF variant") {
    val id = Z3Uuid(-78.1, 38.2, time, period)
    assert(id.toString.substring(0, 18) == "e09456f9-fc84-4f5c")
    assert(id.version() == 4)
    assert(id.variant() == 2)
  }

  test("polygon centroid uuid has the reference's exact z3 prefix") {
    // POLYGON((-78.1 38.2, -78.1 39, -78 39, -78 38.2, -78.1 38.2))
    // centroid = (-78.05, 38.6)
    val id = Z3Uuid(-78.05, 38.6, time, period)
    assert(id.toString.substring(0, 18) == "909456f9-fc86-4fcd")
    assert(id.version() == 4)
    assert(id.variant() == 2)
  }

  test("msb is deterministic; lsb varies; injected lsb is reproducible") {
    val a = Z3Uuid(-78.1, 38.2, time, period)
    val b = Z3Uuid(-78.1, 38.2, time, period)
    assert(a.getMostSignificantBits == b.getMostSignificantBits)
    assert(a.getLeastSignificantBits != b.getLeastSignificantBits)
    val c = Z3Uuid.withLsb(-78.1, 38.2, time, period, 12345L)
    val d = Z3Uuid.withLsb(-78.1, 38.2, time, period, 12345L)
    assert(c == d)
    assert(c.variant() == 2) // variant forced even on injected lsb
  }

  test("nearby points and times share prefixes; far ones differ") {
    val base = Z3Uuid.msb(-78.1, 38.2, time, period)
    val near = Z3Uuid.msb(-78.1000001, 38.2000001, time + 10, period)
    val far = Z3Uuid.msb(100.0, -40.0, time, period)
    // same shard+z3 to within the dropped low bits -> near ids equal here
    assert(base == near)
    assert(base != far)
  }

  test("shard nibble round-trips and spreads over 16 values") {
    val id = Z3Uuid(-78.1, 38.2, time, period)
    assert(Z3Uuid.shard(id) == 0xe.toByte)
    val shards = (0 until 200).map { i =>
      Z3Uuid.shard(Z3Uuid(-170 + i * 1.7, -80 + i * 0.8, time + i * 86400000L, period))
    }.toSet
    assert(shards.size > 8)
  }

  test("time-sorted uuids: reference format + time-ordered msb " +
      "(TimeSortedUuidGeneratorTest)") {
    // the reference's fixture: time 1435598908099 -> "000014e4-05ce-4ac3"
    val time = 1435598908099L
    val id = Z3Uuid.timeSorted(time)
    assert(id.toString.substring(0, 18) == "000014e4-05ce-4ac3")
    assert(id.version == 4 && id.variant == 2)
    // time is the msb: ids sort chronologically
    val ids = Seq(time - 1, time, time + 1, time + 1000)
      .map(Z3Uuid.timeSorted(_).toString)
    assert(ids.sorted == ids)
    // deterministic-LSB variant forces the IETF variant bits
    assert(Z3Uuid.timeSortedWithLsb(time, -1L).variant == 2)
    intercept[IllegalArgumentException](Z3Uuid.timeSorted(-1L))
  }
}
