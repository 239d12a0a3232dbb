package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkTest

/** The reference's shared stats fixture, run through our Spark-native
  * stat aggregations.
  *
  * The reference drives every stat test from one generator
  * (geomesa-utils/src/test/scala/.../stats/StatTestHelper.scala:24-40):
  * 100 features with strAttr=abc000..abc099, numeric attrs 0..99,
  * POINT(-i, i/2), dtg spread over 2012-01-01; a second set 100..199 a
  * day later; a third set -100..-1. "Merge" in the reference is
  * `stat += stat2` (Stat.scala); here a merge is what Spark's partial
  * aggregation does across partitions, so each merged expectation runs
  * over `union(...).repartition(7)` — same semantics, exercised through
  * the engine's real combine path.
  *
  * Expected values are ported from MinMaxTest, HistogramTest, TopKTest,
  * EnumerationStatTest, FrequencyTest and DescriptiveStatsTest.
  */
class StatFixturesSpec extends AnyFunSuite with SparkTest {

  private def millis(s: String): Long = java.time.Instant.parse(s).toEpochMilli

  /** StatTestHelper.features: i in [0, 100). */
  private lazy val features: DataFrame = fixture(0 until 100, day = 1, geo = i => (-i.toDouble, i / 2.0))
  /** StatTestHelper.features2: i in [100, 200), a day later, shifted points. */
  private lazy val features2: DataFrame = fixture(100 until 200, day = 2, geo = i => (i - 20.0, i / 2.0 - 20.0))
  /** StatTestHelper.features3: i in [-100, 0). */
  private lazy val features3: DataFrame = fixture(-100 until 0, day = 2, geo = i => (i.toDouble, i.toDouble))

  private def fixture(range: Range, day: Int, geo: Int => (Double, Double)): DataFrame = {
    import spark.implicits._
    range.map { i =>
      val str = if (i < 0) f"abc$i%+03d" else f"abc$i%03d"
      val (lon, lat) = geo(i)
      val dtg = millis(f"2012-01-$day%02dT${math.abs(i) % 24}%02d:00:00.000Z")
      (str, i, i.toLong, i.toDouble, i.toFloat, i % 10,
        ((math.abs(i % 26)) + 'A').toChar.toString, lon, lat, dtg)
    }.toDF("strAttr", "intAttr", "longAttr", "doubleAttr", "floatAttr",
      "cat1", "cat2", "lon", "lat", "dtg")
  }

  private def merged(dfs: DataFrame*): DataFrame =
    dfs.reduce(_ unionAll _).repartition(7)

  // MinMaxTest: "observe correct values" / "combine two MinMaxes"
  test("MinMax: string and numeric bounds, HLL cardinality, merge") {
    val r = Stats.minMaxCardinality(features, "strAttr").head
    assert(r.getAs[String]("min") == "abc000" && r.getAs[String]("max") == "abc099")
    assert(math.abs(r.getAs[Long]("approx_cardinality") - 100L) <= 5)

    val ri = Stats.minMaxCardinality(features, "intAttr").head
    assert(ri.getAs[Int]("min") == 0 && ri.getAs[Int]("max") == 99)

    val rm = Stats.minMaxCardinality(merged(features, features2), "strAttr").head
    assert(rm.getAs[String]("min") == "abc000" && rm.getAs[String]("max") == "abc199")
    assert(math.abs(rm.getAs[Long]("approx_cardinality") - 200L) <= 10)

    // DescriptiveStatsTest "negatives": bounds (-100, -1)
    val rn = Stats.minMaxCardinality(features3, "longAttr").head
    assert(rn.getAs[Long]("min") == -100L && rn.getAs[Long]("max") == -1L)
  }

  // HistogramTest int fixture: 20 bins over [0, 200) — features fill the
  // first 10 bins with 10 each; merging features2 fills all 20.
  test("Histogram: bin counts and merge parity") {
    def counts(df: DataFrame): Map[Int, Long] =
      Stats.histogram(df, "intAttr", 0.0, 200.0, 20).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap

    val h1 = counts(features)
    assert((0 until 10).forall(h1.getOrElse(_, 0L) == 10L))
    assert((10 until 20).forall(h1.getOrElse(_, 0L) == 0L))

    val h2 = counts(merged(features, features2))
    assert((0 until 20).forall(h2.getOrElse(_, 0L) == 10L))
    assert(h2.values.sum == 200L)
  }

  // TopKTest: skewed name distribution 50/20/15/10/5, then merged with a
  // disjoint second distribution — exact (value, count) order including
  // the reference's count-desc ordering.
  test("TopK: exact ranked counts and merge") {
    import spark.implicits._
    def topkDf(suffix: String): DataFrame = (0 until 100).map { i =>
      if (i < 10) s"name10$suffix"
      else if (i < 15) s"name15$suffix"
      else if (i < 30) s"name30$suffix"
      else if (i < 50) s"name50$suffix"
      else s"name100$suffix"
    }.toDF("name")

    val top = Stats.topK(topkDf(""), "name", 10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("name100", 50L), ("name50", 20L), ("name30", 15L),
      ("name10", 10L), ("name15", 5L)))

    val both = Stats.topK(merged(topkDf(""), topkDf("-2")), "name", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(both.toSeq == Seq(
      ("name100", 50L), ("name100-2", 50L), ("name50", 20L), ("name50-2", 20L),
      ("name30", 15L), ("name30-2", 15L), ("name10", 10L), ("name10-2", 10L),
      ("name15", 5L), ("name15-2", 5L)))
  }

  // EnumerationStatTest: every value seen exactly once; merged = 200
  // distinct values, still once each.
  test("Enumeration: exact value counts and merge") {
    val e1 = Stats.enumeration(features, "strAttr").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(e1.size == 100 && e1.values.forall(_ == 1L))
    assert((0 until 100).forall(i => e1.get(f"abc$i%03d").contains(1L)))

    val e2 = Stats.enumeration(merged(features, features2), "strAttr").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(e2.size == 200 && e2.values.forall(_ == 1L))
  }

  // FrequencyTest: every observed value estimates in [1, 2]; an
  // unobserved value estimates 0 at this precision (seeded, so stable).
  test("Frequency: count-min estimates bounded like the reference") {
    val bytes = Stats.countMinSketch(features, "strAttr").head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    (0 until 100).foreach { i =>
      val est = cms.estimateCount(f"abc$i%03d")
      assert(est >= 1L && est <= 2L, s"abc$i%03d -> $est")
    }
    assert(cms.estimateCount("foo") == 0L)
  }

  // DescriptiveStatsTest: moments over intAttr 0..99 (closed forms).
  test("DescriptiveStats: exact moments on the fixture") {
    val r = Stats.descriptive(features, Seq("intAttr")).head
    assert(r.getAs[Long]("intAttr_count") == 100L)
    assert(r.getAs[Int]("intAttr_min") == 0 && r.getAs[Int]("intAttr_max") == 99)
    assert(math.abs(r.getAs[Double]("intAttr_mean") - 49.5) < 1e-12)
    // var_samp of 0..99 = n(n+1)/12 with n=100 -> 841.66...
    assert(math.abs(r.getAs[Double]("intAttr_var") - 100.0 * 101.0 / 12.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intAttr_skew")) < 1e-9) // symmetric
  }

  // Z3HistogramTest shape: features land in one 2012-01-01 week bin;
  // counts are conserved under merge.
  test("Z3Histogram: week binning conserves counts across merges") {
    def sumCounts(df: DataFrame): (Long, Long) = {
      val rows = Stats.z3Histogram(df, "lon", "lat", "dtg", "week", 4).collect()
      (rows.map(_.getAs[Long]("count")).sum, rows.map(_.getAs[Int]("time_bin").toLong).distinct.length.toLong)
    }
    val (n1, bins1) = sumCounts(features)
    assert(n1 == 100L && bins1 == 1L) // all dtgs inside the same week
    val (n2, _) = sumCounts(merged(features, features2, features3))
    assert(n2 == 300L)
  }

  // GroupByTest shape: cat1 = i % 10 -> 10 groups of 10 with closed-form
  // min/max per group.
  test("GroupBy stat: per-category MinMax on the fixture") {
    val rows = Stats.groupedMinMax(features, "cat1", "intAttr").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val g = r.getInt(0)
      assert(r.getAs[Int]("min") == g && r.getAs[Int]("max") == 90 + g)
    }
  }
}
