package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.functions.StFunctions

/** Grammar + semantics cases ported from the reference's StatParserTest
  * (geomesa-utils/.../stats/StatParserTest.scala shapes). */
class StatDslSpec extends AnyFunSuite with SparkTest {

  private lazy val df = {
    import spark.implicits._
    Seq(
      ("a", 1.0, 10L), ("a", 3.0, 11L), ("b", 5.0, 12L),
      ("b", 7.0, 13L), ("b", -2.0, 14L), ("c", 100.0, 15L)
    ).toDF("name", "value", "n")
  }

  test("Count()") {
    val r = StatDsl.parse(df, "Count()").collect()(0)
    assert(r.getAs[Long]("count") == 6L)
  }

  test("IteratorStackCount() aggregates the partition count legally") {
    // an aggregate over spark_partition_id() directly is rejected by the
    // analyzer; parse() pre-projects it
    val r = StatDsl.parse(df.repartition(3), "IteratorStackCount();Count()").collect()(0)
    assert(r.getAs[Long]("iterator_stack_count") >= 1L)
    assert(r.getAs[Long]("iterator_stack_count") <= 3L)
    assert(r.getAs[Long]("count") == 6L)
  }

  test("SeqStat: MinMax(value);Count();Enumeration(name)") {
    val r = StatDsl.parse(df, "MinMax(value);Count();Enumeration(name)").collect()(0)
    assert(r.getAs[Double]("value_min") == -2.0)
    assert(r.getAs[Double]("value_max") == 100.0)
    assert(r.getAs[Long]("count") == 6L)
    assert(r.getAs[Map[String, Long]]("name_enumeration") == Map("a" -> 2L, "b" -> 3L, "c" -> 1L))
  }

  test("quoted attribute names parse like the reference grammar") {
    val r = StatDsl.parse(df, "MinMax(\"value\")").collect()(0)
    assert(r.getAs[Double]("value_min") == -2.0)
  }

  test("TopK: count-desc with deterministic value tiebreak") {
    val r = StatDsl.parse(df, "TopK(name)").collect()(0)
    val topk = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("name_topk"))
      .map(x => (x.getString(0), x.getLong(1)))
    assert(topk == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("Histogram: fixed bins, out-of-range clamps to end bins") {
    val r = StatDsl.parse(df, "Histogram(value,4,0.0,8.0)").collect()(0)
    // bins of width 2 over [0,8): {1,-2(clamped)}->bin0, 3->bin1,
    // 5->bin2, {7,100(clamped)}->bin3
    val h = r.getSeq[Long](r.fieldIndex("value_histogram"))
    assert(h == Seq(2L, 1L, 1L, 2L))
  }

  test("DescriptiveStats emits the moment columns") {
    val r = StatDsl.parse(df, "DescriptiveStats(value)").collect()(0)
    assert(r.getAs[Long]("value_count") == 6L)
    assert(math.abs(r.getAs[Double]("value_mean") - 19.0) < 1e-9)
  }

  test("GroupBy(name,MinMax(value);Count())") {
    val rows = StatDsl.parse(df, "GroupBy(name,MinMax(value);Count())")
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("value_min"),
        r.getAs[Double]("value_max"), r.getAs[Long]("count"))).toMap
    assert(rows("b") == (-2.0, 7.0, 3L))
    assert(rows("a") == (1.0, 3.0, 2L))
  }

  test("Frequency returns a count-min sketch binary") {
    val r = StatDsl.parse(df, "Frequency(name,100)").collect()(0)
    assert(r.getAs[Array[Byte]]("name_frequency").nonEmpty)
  }

  test("Z3Histogram over a WKB geom + timestamp") {
    StFunctions.register(spark)
    import spark.implicits._
    val g = Seq((1.0, 2.0, "2024-03-04 10:00:00"), (100.0, -40.0, "2024-03-11 10:00:00"))
      .toDF("lon", "lat", "ts")
      .selectExpr("st_makePoint(lon, lat) AS geom", "CAST(ts AS TIMESTAMP) AS dtg")
    val r = StatDsl.parse(g, "Z3Histogram(geom,dtg,week,4)").collect()(0)
    val m = r.getAs[Map[String, Long]]("geom_z3_histogram")
    assert(m.size == 2 && m.values.sum == 2)
  }

  test("parse errors: unknown stat, mixed top-level GroupBy, unbalanced parens") {
    intercept[IllegalArgumentException](StatDsl.parse(df, "Bogus(value)"))
    intercept[IllegalArgumentException](StatDsl.parse(df, "GroupBy(name,Count());Count()"))
    intercept[IllegalArgumentException](StatDsl.parse(df, "MinMax(value"))
    intercept[IllegalArgumentException](StatDsl.parse(df, "Count(x)"))
    intercept[IllegalArgumentException](StatDsl.parse(df, "Frequency(name,week,7)"))
    // empty stat string and degenerate histogram bounds fail loudly
    intercept[IllegalArgumentException](StatDsl.parse(df, ""))
    intercept[IllegalArgumentException](StatDsl.parse(df, "Histogram(value,0,0.0,8.0)"))
    intercept[IllegalArgumentException](StatDsl.parse(df, "Histogram(value,4,8.0,8.0)"))
  }

  test("nested GroupBy stats can be map-valued (Enumeration per group)") {
    val rows = StatDsl.parse(df, "GroupBy(name,Enumeration(n))").collect()
    assert(rows.length == 3)
    val b = rows.find(_.getString(0) == "b").get
    assert(b.getAs[Map[String, Long]]("n_enumeration").keySet == Set("12", "13", "14"))
  }
}
