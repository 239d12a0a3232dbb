package graft.geom

import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/**
 * Thread-local content-keyed LRU of parsed (and prepared) geometries.
 *
 * In a cell equi-join the broadcast side's WKB bytes reach the refine
 * predicate once per candidate pair — naively that is one WKB parse +
 * JTS allocation per pair (50M parses of the same 2k zones at bench
 * scale), which makes the refine allocation-bound and caps multi-core
 * scaling. Executor threads are long-lived, so a per-thread LRU keyed by
 * content turns that into a hash lookup; PreparedGeometry additionally
 * caches the edge index for repeated intersects/contains calls (the
 * JTS-sweepline trick the reference uses per partition,
 * GeoMesaSparkSQL.scala:323-342, in cache form).
 */
object GeomCache {

  private final val MaxEntries = 4096

  private final class Key(val bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }

  private final class Lru[V] extends java.util.LinkedHashMap[Key, V](256, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, V]): Boolean =
      size() > MaxEntries
  }

  private val geoms = ThreadLocal.withInitial[Lru[Geometry]](() => new Lru[Geometry])
  private val prepared = ThreadLocal.withInitial[Lru[PreparedGeometry]](() => new Lru[PreparedGeometry])

  def geom(wkb: Array[Byte]): Geometry = {
    val m = geoms.get
    val k = new Key(wkb)
    var g = m.get(k)
    if (g == null) { g = GeomOps.fromWkb(wkb); m.put(k, g) }
    g
  }

  def prep(wkb: Array[Byte]): PreparedGeometry = {
    val m = prepared.get
    val k = new Key(wkb)
    var p = m.get(k)
    if (p == null) { p = PreparedGeometryFactory.prepare(GeomOps.fromWkb(wkb)); m.put(k, p) }
    p
  }
}
