package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest

class DisjointSpec extends AnyFunSuite with SparkTest {

  test("disjoint branches partition the OR: union equals OR-filter, no dupes") {
    import spark.implicits._
    val df = (1 to 1000).toDF("v")
    // overlapping predicates
    val branches = Seq(col("v") < 400, col("v").between(200, 700), col("v") % 2 === 0)
    val viaOr = df.where(branches.reduce(_ || _)).select("v").as[Int].collect().sorted
    val viaUnion = Disjoint.unionScans(df, branches).select("v").as[Int].collect().sorted
    assert(viaUnion.length == viaUnion.distinct.length, "union produced duplicates")
    assert(viaUnion.toSeq == viaOr.toSeq)
    // each row satisfies exactly one disjoint branch
    val dis = Disjoint.makeDisjoint(branches)
    val counts = df.select(dis.map(b => b.cast("int")).reduce(_ + _).as("k"))
      .groupBy("k").count().collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(counts.keySet.subsetOf(Set(0, 1)))
  }

  test("nullable predicate columns: three-valued logic must not drop rows " +
    "(A NULL, B TRUE satisfies A OR B)") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some(10)), (None, Some(10)), (None, None),
      (Some(5), None), (Some(1), Some(99)), (None, Some(99))
    ).toDF("a", "b")
    val branches = Seq(col("a") < 3, col("b") < 50)
    val viaOr = df.where(branches.reduce(_ || _)).count()
    val viaUnion = Disjoint.unionScans(df, branches).count()
    assert(viaUnion == viaOr, s"union=$viaUnion or=$viaOr — null branch dropped rows")
    // (1,10) via A; (None,10) via B even though A is NULL; (1,99) via A
    assert(viaOr == 3)
  }

  test("taggedScan: one FileScan, same multiset as unionScans, first-match tag") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_disjoint").toString + "/t"
    (1 to 1000).map(i => (i, i % 7)).toDF("v", "m").write.parquet(dir)
    val df = spark.read.parquet(dir)
    val branches = Seq(col("v") < 400, col("m") === 3, col("v") > 900)
    val viaUnion = Disjoint.unionScans(df, branches).select("v").as[Int].collect().sorted
    val tagged = Disjoint.taggedScan(df, branches)
    val viaTag = tagged.select("v").as[Int].collect().sorted
    assert(viaTag.toSeq == viaUnion.toSeq)
    // the tag is the FIRST satisfied branch
    val r = tagged.where(col("v") === 353).head // v<400 and m=3 both true
    assert(r.getAs[Int]("branch") == 0)
    assert(tagged.where(col("v") === 903).head.getAs[Int]("branch") == 2)
    // single-scan plan: exactly ONE file scan vs unionScans' k
    def scans(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.collectLeaves().count {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case _ => false
      }
    assert(scans(tagged) == 1, "taggedScan must read the table once")
    assert(scans(Disjoint.unionScans(df, branches)) == branches.size)
    // nulls: a NULL branch never tags, null-safely
    val nd = Seq((Some(1), Some(10)), (None, Some(10))).toDF("a", "b")
    val t2 = Disjoint.taggedScan(nd, Seq(col("a") < 3, col("b") < 50))
    assert(t2.count() == 2)
    assert(t2.where(col("a").isNull).head.getAs[Int]("branch") == 1)
  }

  // Ported from OrSplittingFilterTest (geomesa-filter/src/test/.../
  // OrSplittingFilterTest.scala:43-70): split counts per filter shape.
  test("Cql.splitOr matches OrSplittingFilter's branch counts") {
    val geom1 = "INTERSECTS(geom, POLYGON ((41 28, 42 28, 42 29, 41 29, 41 28)))"
    val geom2 = "INTERSECTS(geom, POLYGON ((44 23, 46 23, 46 25, 44 25, 44 23)))"
    val date1 = "(dtg BETWEEN '2000-01-01T00:00:00.000Z' AND '2020-12-31T23:59:59.000Z')"
    def f(i: Int) = s"attr$i = 'val$i'"

    // "not do anything to filters without a top-level OR"
    for (s <- Seq(geom1, s"$geom1 AND $date1", s"${f(1)} AND ${f(2)}",
        s"NOT (${f(3)} AND ${f(4)})", s"NOT (${f(1)} OR ${f(3)})"))
      assert(Cql.splitOr(s) == Seq(s), s"expected no split for: $s")

    // "split an OR into two pieces"
    for (s <- Seq(s"$geom1 OR $geom2", s"$geom2 OR $date1",
        s"${f(1)} OR ${f(2)}", s"$geom1 OR ${f(3)}"))
      assert(Cql.splitOr(s).size == 2, s"expected 2 branches for: $s")

    // "recursively split nested ORs"
    for (s <- Seq(s"($geom1 OR $date1) OR $geom2",
        s"${f(1)} OR ${f(2)} OR ${f(3)}",
        s"${f(1)} OR (${f(2)} AND ${f(3)}) OR ${f(4)}",
        s"${f(1)} OR ($geom2 OR $date1)"))
      assert(Cql.splitOr(s).size == 3, s"expected 3 branches for: $s")

    // "not run through lower-level filters"
    assert(Cql.splitOr(s"NOT (${f(3)} OR ${f(4)}) OR (${f(1)} AND ${f(2)})").size == 2)

    // degenerate ORs are parse errors, not index crashes
    intercept[Exception](Cql.splitOr("attr1 = 'x' OR"))
    intercept[Exception](Cql.splitOr("OR attr1 = 'x'"))

    // an OR inside a string literal is data, not a split point
    assert(Cql.splitOr("attr1 = 'a OR b' OR attr2 = 'c'").size == 2)
    assert(Cql.splitOr("attr1 = 'a OR b'") == Seq("attr1 = 'a OR b'"))

    // every branch must itself parse, and the split round-trips: the OR
    // of the branch predicates selects the same rows as the original
    import spark.implicits._
    val df = Seq((1, "val1", "val2"), (2, "x", "val2"), (3, "x", "x"))
      .toDF("id", "attr1", "attr2")
    val orig = s"${f(1)} OR (${f(2)} AND id < 3)"
    val branches = Cql.splitOr(orig).map(b => Cql.parse(b))
    val viaSplit = df.where(branches.reduce(_ || _)).select("id").as[Int].collect().sorted
    val viaOrig = df.where(Cql.parse(orig)).select("id").as[Int].collect().sorted
    assert(viaSplit.toSeq == viaOrig.toSeq && viaSplit.nonEmpty)
  }
}
