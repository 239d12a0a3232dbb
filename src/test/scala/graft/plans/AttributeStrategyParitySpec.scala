package graft.plans

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkTest
import graft.functions.StFunctions

/**
 * The reference's AttributeIndexStrategyTest fixture run verbatim
 * through the CQL surface (geomesa-accumulo-datastore/src/test/scala/
 * org/locationtech/geomesa/accumulo/index/AttributeIndexStrategyTest
 * .scala:45-905): the same four features (alice/bill/bob/charles) and
 * the same ~70 filter strings, asserting the reference's exact result
 * sets. Covers equality/range/LIKE strategies over int/long/float/
 * double/boolean/string/date attributes, literal-on-the-left
 * comparisons, multi-valued List attributes (any-element semantics),
 * IS NOT NULL over a null attribute, and redundant/contradictory AND
 * range combinations.
 */
class AttributeStrategyParitySpec extends AnyFunSuite with Matchers with SparkTest {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  // AttributeIndexStrategyTest.scala:56-78 — the four features.
  // geom POINT(lon 45..48, lat 49); charles.age is null; charles.toes
  // is the empty list.
  private lazy val people: DataFrame = {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("age", IntegerType),
      StructField("count", LongType),
      StructField("weight", DoubleType),
      StructField("height", FloatType),
      StructField("admin", BooleanType),
      StructField("lon", DoubleType),
      StructField("lat", DoubleType),
      StructField("dtg", TimestampType),
      StructField("indexedDtg", TimestampType),
      StructField("fingers", ArrayType(StringType)),
      StructField("toes", ArrayType(DoubleType)),
      StructField("track", StringType)))
    val aliceD = ts("2012-01-01T12:00:00.000Z")
    val billD = ts("2013-01-01T12:00:00.000Z")
    val bobD = ts("2014-01-01T12:00:00.000Z")
    val charlesD = ts("2014-01-01T12:30:00.000Z")
    val rows = Seq(
      Row("alice", 20, 1L, 5.0, 10.0f, true, 45.0, 49.0, aliceD, aliceD,
        Seq("index"), Seq(1.0), "track1"),
      Row("bill", 21, 2L, 6.0, 11.0f, false, 46.0, 49.0, billD, billD,
        Seq("ring", "middle"), Seq(1.0, 2.0), "track2"),
      Row("bob", 30, 3L, 6.0, 12.0f, false, 47.0, 49.0, bobD, bobD,
        Seq("index", "thumb", "pinkie"), Seq(3.0, 2.0, 5.0), "track1"),
      Row("charles", null, 4L, 7.0, 12.0f, false, 48.0, 49.0, charlesD, charlesD,
        Seq("thumb", "ring", "index", "pinkie", "middle"), Seq.empty[Double], "track1"))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      .cache()
  }

  // the reference's execute(filter) returning the matched names; geom
  // resolves to st_makePoint(lon, lat) as on any lon/lat table
  private def execute(filter: String): Set[String] =
    Cql.filter(people, filter,
        props = Map("geom" -> StFunctions.stMakePoint(col("lon"), col("lat"))))
      .select("name").collect().map(_.getString(0)).toSet

  private val all = Set("alice", "bill", "bob", "charles")

  // (filter string, reference's expected names) — the execute() cases of
  // AttributeIndexStrategyTest, in file order.
  private val cases: Seq[(String, Set[String])] = Seq(
    // "all attribute filters should be applied to SFFI" (:113)
    "name LIKE 'b%' AND count<27 AND age<29" -> Set("bill"),
    // AttributeIndexEqualsStrategy (:415-512)
    "age=21" -> Set("bill"),
    "count=2" -> Set("bill"),
    "height=12.0" -> Set("bob", "charles"),
    "height=10" -> Set("alice"),
    "weight=6.0" -> Set("bill", "bob"),
    "weight=6" -> Set("bill", "bob"),
    "admin=false" -> Set("bill", "bob", "charles"),
    "name='bill'" -> Set("bill"),
    "name = 'bill' OR name = 'charles'" -> Set("bill", "charles"),
    "name IN ('bill', 'charles')" -> Set("bill", "charles"),
    "(name = 'bill' OR name = 'charles') AND bbox(geom,40,45,50,55)" -> Set("bill", "charles"),
    "name IN ('bill', 'charles') AND bbox(geom,40,45,50,55)" -> Set("bill", "charles"),
    "(name = 'bill' OR name = 'charles') AND name = 'charles'" -> Set("charles"),
    "indexedDtg TEQUALS 2014-01-01T12:30:00.000Z" -> Set("charles"),
    "indexedDtg = '2014-01-01T12:30:00.000Z'" -> Set("charles"),
    "fingers = 'index'" -> Set("alice", "bob", "charles"),
    "toes = 2.0" -> Set("bill", "bob"),
    // AttributeIndexRangeStrategy: ints with nulls (:516-540)
    "age<21" -> Set("alice"),
    "age>21" -> Set("bob"),
    "age<=21" -> Set("alice", "bill"),
    "age>=21" -> Set("bill", "bob"),
    "age BETWEEN 20 AND 25" -> Set("alice", "bill"),
    // longs (:542-566)
    "count<2" -> Set("alice"),
    "count>2" -> Set("bob", "charles"),
    "count<=2" -> Set("alice", "bill"),
    "count>=2" -> Set("bill", "bob", "charles"),
    "count BETWEEN 3 AND 7" -> Set("bob", "charles"),
    // floats (:568-592)
    "height<12.0" -> Set("alice", "bill"),
    "height>12.0" -> Set.empty[String],
    "height<=12.0" -> all,
    "height>=12.0" -> Set("bob", "charles"),
    "height BETWEEN 10.0 AND 11.5" -> Set("alice", "bill"),
    // floats in different precisions (:594-618)
    "height<11" -> Set("alice"),
    "height>11" -> Set("bob", "charles"),
    "height<=11" -> Set("alice", "bill"),
    "height>=11" -> Set("bill", "bob", "charles"),
    "height BETWEEN 11 AND 12" -> Set("bill", "bob", "charles"),
    // doubles (:620-654)
    "weight<6.0" -> Set("alice"),
    "weight<6.1" -> Set("alice", "bill", "bob"),
    "weight>6.0" -> Set("charles"),
    "weight>5.9" -> Set("bill", "bob", "charles"),
    "weight<=6.0" -> Set("alice", "bill", "bob"),
    "weight>=6.0" -> Set("bill", "bob", "charles"),
    "weight BETWEEN 5.5 AND 6.5" -> Set("bill", "bob"),
    // doubles in different precisions (:656-680)
    "weight<6" -> Set("alice"),
    "weight>6" -> Set("charles"),
    "weight<=6" -> Set("alice", "bill", "bob"),
    "weight>=6" -> Set("bill", "bob", "charles"),
    "weight BETWEEN 5 AND 6" -> Set("alice", "bill", "bob"),
    // strings (:682-706)
    "name<'bill'" -> Set("alice"),
    "name>'bill'" -> Set("bob", "charles"),
    "name<='bill'" -> Set("alice", "bill"),
    "name>='bill'" -> Set("bill", "bob", "charles"),
    "name BETWEEN 'bill' AND 'bob'" -> Set("bill", "bob"),
    // date objects (:708-722)
    "indexedDtg BEFORE 2014-01-01T12:30:00.000Z" -> Set("alice", "bill", "bob"),
    "indexedDtg AFTER 2013-01-01T12:30:00.000Z" -> Set("bob", "charles"),
    "indexedDtg DURING 2012-01-01T11:00:00.000Z/2014-01-01T12:15:00.000Z" ->
      Set("alice", "bill", "bob"),
    // date strings (:724-738)
    "indexedDtg < '2014-01-01T12:30:00.000Z'" -> Set("alice", "bill", "bob"),
    "indexedDtg > '2013-01-01T12:00:00.000Z'" -> Set("bob", "charles"),
    "indexedDtg BETWEEN '2012-01-01T12:00:00.000Z' AND '2013-01-01T12:00:00.000Z'" ->
      Set("alice", "bill"),
    // attribute on the right side (:740-762)
    "'bill' > name" -> Set("alice"),
    "'bill' < name" -> Set("bob", "charles"),
    "'bill' >= name" -> Set("alice", "bill"),
    "'bill' <= name" -> Set("bill", "bob", "charles"),
    // lists of strings (:770-794)
    "fingers<'middle'" -> Set("alice", "bob", "charles"),
    "fingers>'middle'" -> Set("bill", "bob", "charles"),
    "fingers<='middle'" -> all,
    "fingers>='middle'" -> Set("bill", "bob", "charles"),
    "fingers BETWEEN 'pinkie' AND 'thumb'" -> Set("bill", "bob", "charles"),
    // lists of doubles (:796-820) — charles's empty list matches nothing
    "toes<2.0" -> Set("alice", "bill"),
    "toes>2.0" -> Set("bob"),
    "toes<=2.0" -> Set("alice", "bill", "bob"),
    "toes>=2.0" -> Set("bill", "bob"),
    "toes BETWEEN 1.5 AND 2.5" -> Set("bill", "bob"),
    // not nulls (:822-826)
    "age IS NOT NULL" -> Set("alice", "bill", "bob"),
    // nonsensical AND queries (:828-871)
    "age > 25 AND age > 15" -> Set("bob"),
    "age > 25 AND age < 15" -> Set.empty[String],
    "height >= 6 AND height > 4" -> all,
    "height >= 6 AND height < 4" -> Set.empty[String],
    "indexedDtg AFTER 2011-01-01T00:00:00.000Z AND indexedDtg AFTER 2012-02-01T00:00:00.000Z" ->
      Set("bill", "bob", "charles"),
    "indexedDtg BEFORE 2011-01-01T00:00:00.000Z AND indexedDtg AFTER 2012-01-01T00:00:00.000Z" ->
      Set.empty[String],
    "height >= 6 AND height > 4 AND indexedDtg AFTER 2011-01-01T00:00:00.000Z AND indexedDtg AFTER 2012-02-01T00:00:00.000Z" ->
      Set("bill", "bob", "charles"),
    "height >= 6 AND height > 4 AND indexedDtg BEFORE 2011-01-01T00:00:00.000Z AND indexedDtg AFTER 2012-01-01T00:00:00.000Z" ->
      Set.empty[String],
    // AttributeIndexLikeStrategy (:875-879); the non-string LIKE case is
    // pendingUntilFixed in the reference itself, so not ported
    "name LIKE 'b%'" -> Set("bill", "bob"))

  test("every AttributeIndexStrategyTest filter returns the reference's exact names") {
    val failures = cases.flatMap { case (f, expected) =>
      val got = execute(f)
      if (got == expected) None else Some(s"$f -> got $got, expected $expected")
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
  }

  test("a literal AFTER/BEFORE a property is a parse error, as in the reference (:755-761)") {
    an[Exception] should be thrownBy execute("2014-01-01T12:30:00.000Z AFTER indexedDtg")
    an[Exception] should be thrownBy execute("2013-01-01T12:30:00.000Z BEFORE indexedDtg")
  }
}
