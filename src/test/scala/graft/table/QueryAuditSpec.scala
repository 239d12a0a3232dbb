package graft.table

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.functions.StFunctions

/**
 * Query-audit parity: the write->read round-trip of
 * AccumuloQueryEventTransformTest (toMutation/toEvent restores the
 * event exactly) plus the audited-query surface recording real
 * plan/scan/hit numbers.
 */
class QueryAuditSpec extends AnyFunSuite with SparkTest {

  test("audit events round-trip through the audit table exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft_audit").toString
    // the reference fixture's shape: a stored event reads back equal
    val e = QueryAudit.Event("accumulo-test", "type-name", 1463861694L, "user1000",
      "attr=1", "hint1=true", 101L, 201L, 5L)
    QueryAudit.log(spark, root, e)
    QueryAudit.log(spark, root, e.copy(date = 1463861695L, hits = 6L))
    val back = QueryAudit.read(spark, root).collect()
      .map(r => QueryAudit.Event(r.getAs[String]("storeType"), r.getAs[String]("typeName"),
        r.getAs[Long]("date"), r.getAs[String]("user"), r.getAs[String]("filter"),
        r.getAs[String]("hints"), r.getAs[Long]("planTime"), r.getAs[Long]("scanTime"),
        r.getAs[Long]("hits")))
    assert(back.toSet === Set(e, e.copy(date = 1463861695L, hits = 6L)))
  }

  test("audited queries record filter, user, timings, and the true hit count") {
    val s = spark
    import s.implicits._
    StFunctions.register(s)
    val root = java.nio.file.Files.createTempDirectory("graft_audit_q").toString
    val df = (0 until 100).map(i => (s"f$i", -10.0 + i % 20, 5.0 + i % 10))
      .toDF("id", "lon", "lat")
    SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 2)
    val (rows, event) = QueryAudit.audited(spark, root, "s1",
      "BBOX(geom, -10.5, 4.5, -5.5, 14.5)", typeName = "pts",
      user = () => "auditor")
    assert(event.hits === rows.count())
    assert(event.hits > 0 && event.user === "auditor" && event.typeName === "pts")
    assert(event.filter.startsWith("BBOX"))
    assert(event.planTime >= 0 && event.scanTime > 0)
    val table = QueryAudit.read(spark, root)
    assert(table.count() === 1)
    assert(table.select("hits").head.getLong(0) === event.hits)
  }
}
