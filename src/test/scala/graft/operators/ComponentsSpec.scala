package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest

/** Connected components (large-star/small-star) vs a union-find oracle —
  * the pairs->groups step of the dedup pipeline. */
class ComponentsSpec extends AnyFunSuite with SparkTest {

  /** Reference union-find over the same edges. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum root (union by min keeps roots minimal)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("random graph matches union-find, only ids in pairs are labeled") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 300
    val edges = Seq.fill(260)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(n, edges)
    val got = Dedup.components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val inPairs = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.keySet == inPairs)
    got.foreach { case (id, comp) => assert(comp == expected(id), s"node $id") }
  }

  test("a long chain converges in logarithmic rounds (not diameter)") {
    import spark.implicits._
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("a", "b")
    // maxIter 15 << chain length 1000: label propagation would need 1000
    val got = Dedup.components(edges, "a", "b", maxIter = 15)
    assert(got.where(col("component") =!= 0L).count() == 0)
    assert(got.count() == 1000)
  }

  test("labelComponents gives isolated rows singleton components + canonical flags") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id1", "id2")
    val out = Dedup.labelComponents(docs, "doc_id", pairs)
      .select("doc_id", "component", "is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val comp = out.map(r => r._1 -> r._2).toMap
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L))
    assert(out.filter(_._3).map(_._1).toSeq == Seq(0L, 3L, 4L, 5L, 7L, 8L, 9L))
  }

  test("string ids, duplicate and reversed pairs, self-pairs are tolerated") {
    import spark.implicits._
    val pairs = Seq(("b", "a"), ("a", "b"), ("b", "c"), ("x", "x"), ("d", "c"))
      .toDF("id1", "id2")
    val got = Dedup.components(pairs, "id1", "id2")
      .as[(String, String)].collect().toMap
    // x only appears in a self-pair -> dropped entirely (no edge)
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("dedupGroups keeps one canonical row per near-dup cluster") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base), (1L, base + " extra"), (2L, base + " extra word"), // one cluster
      (3L, "completely different content about spark catalyst optimizer internals"),
      (4L, "completely different content about spark catalyst optimizer internals"), // exact dup of 3
      (5L, "nothing like anything else entirely unique text snowflake")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupGroups(docs, "doc_id", "text", threshold = 0.5)
    val canon = out.where(col("is_canonical")).select("doc_id")
      .as[Long].collect().toSet
    assert(canon == Set(0L, 3L, 5L))
  }
}
