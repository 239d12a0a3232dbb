package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/**
 * Ports the reference's TransformersTest cases (geomesa-convert-common
 * src/test/.../TransformersTest.scala) against the Column-compiling
 * transform language. Each case binds $N to the reference's eval()
 * argument array and asserts the same output.
 */
class TransformersSpec extends AnyFunSuite with SparkTest {

  /** eval(expr, args) like the reference's parseTransform(...).eval(...) */
  private def eval(exprStr: String, args: Any*): Any = {
    import scala.jdk.CollectionConverters._
    val cols = args.zipWithIndex.map { case (v, i) => lit(v).as(s"t$i") }
    val df0 = spark.range(1).select(cols: _*)
    val c = Transformers.compile(exprStr, n => col(s"t$n"))
    df0.select(c.as("out")).head.get(0)
  }

  test("literals: strings, ints, longs, floats, doubles, booleans, null") {
    assert(eval("'hello'", "") == "hello")
    assert(eval("''", "") == "")
    assert(eval("1", "") == 1)
    assert(eval("1L", "") == 1L)
    assert(eval("1.0f", "") == 1f)
    assert(eval("-1.0", "") == -1d)
    assert(eval(".1", "") == 0.1d)
    assert(eval("1.0D", "") == 1d)
    assert(eval("true", "") == true)
    assert(eval("false", "") == false)
    assert(eval("null", "") == null)
  }

  test("string functions (reference :86-155)") {
    assert(eval("trim($1)", "", "foo ") == "foo")
    assert(eval("capitalize($1)", "", "foo") == "Foo")
    assert(eval("lowercase($1)", "", "FOO") == "foo")
    assert(eval("uppercase($1)", "", "FoO") == "FOO")
    assert(eval("regexReplace('foo'::r,'bar',$1)", "", "foobar") == "barbar")
    assert(eval("regexReplace('foo'::r,'bar',trim($1))", "", " foobar ") == "barbar")
    assert(eval("substr($1, 2, 5)", "", "foobarbaz") == "foobarbaz".substring(2, 5))
    assert(eval("substring($1, 2, 5)", "", "foobarbaz") == "foobarbaz".substring(2, 5))
    assert(eval("strlen($1)", "", "FOO") == 3)
    assert(eval("length($1)", "", "FOO") == 3)
    assert(eval("toString($1)", "", 5) == "5")
    assert(eval("concat(toString($1), toString($2))", "", 5, 6) == "56")
    assert(eval("concat($1, $2, $3, $4, $5, $6)", "", 1, 2, 3, 4, 5, 6) == "123456")
    assert(eval("mkstring(',', $1, $2, $3, $4, $5, $6)", "", 1, 2, 3, 4, 5, 6) == "1,2,3,4,5,6")
    assert(eval("emptyToNull($1)", "", "foo") == "foo")
    assert(eval("emptyToNull($1)", "", "") == null)
    assert(eval("emptyToNull($1)", "", "  ") == null)
    assert(eval("printf('%s-%s-%sT00:00:00.000Z', '2015', '01', '01')") == "2015-01-01T00:00:00.000Z")
  }

  test("jsonList / jsonMap parse typed JSON collections (JsonConverterTest list/map cases)") {
    assert(eval("jsonList('string', $1)", "", """["s1","s2"]""") ==
      scala.collection.immutable.ArraySeq("s1", "s2"))
    assert(eval("jsonList('integer', $1)", "", "[1,2]") ==
      scala.collection.immutable.ArraySeq(1, 2))
    assert(eval("jsonList('double', $1)", "", "[1.1,2.2]") ==
      scala.collection.immutable.ArraySeq(1.1, 2.2))
    // UUIDs ride as strings (Spark has no UUID type)
    assert(eval("jsonList('UUID', $1)", "", """["12345678-1234-1234-1234-123456781234"]""") ==
      scala.collection.immutable.ArraySeq("12345678-1234-1234-1234-123456781234"))
    assert(eval("jsonMap('string','string', $1)", "", """{"a":"1","b":"2"}""") ==
      Map("a" -> "1", "b" -> "2"))
    assert(eval("jsonMap('int','boolean', $1)", "", """{"1":true,"2":false}""") ==
      Map(1 -> true, 2 -> false))
    // malformed JSON nulls the field (PERMISSIVE), never fails the job
    assert(eval("jsonList('int', $1)", "", "not json") == null)
    intercept[Exception](eval("jsonList('complex', $1)", "", "[1]"))
  }

  test("string literals use Java escapes like the reference's unescapeJava") {
    // \\ is an escaped backslash consuming BOTH chars — a literal that
    // ENDS in a backslash must not swallow its closing quote
    assert(eval("concat($1, '\\\\')", "", "dir") == "dir\\")
    assert(eval("'a\\\\b'") == "a\\b")
    assert(eval("'it\\'s'") == "it's")
    assert(eval("'tab\\there'") == "tab\there")
    assert(eval("'nl\\n'") == "nl\n")
    assert(eval("'u\\u0041'") == "uA")
    intercept[Exception](eval("'unterminated"))
    intercept[Exception](eval("'ends-in-escape\\"))
  }

  test("casts (reference :158-218)") {
    assert(eval("$2", "", "1", 2) == 2)
    assert(eval("$1::int", "", "1") == 1)
    assert(eval("$1::integer", "", 100.0) == 100)
    assert(eval("$1::long", "", "1") == 1L)
    assert(eval("$1::float", "", "1") == 1f)
    assert(eval("$1::double", "", "1") == 1d)
    assert(eval("$1::bool", "", "true") == true)
    assert(eval("$1::boolean", "", "false") == false)
    assert(eval("$1::string", "", 1) == "1")
  }

  test("date functions parse to the reference's instant (reference :220-284)") {
    val testDate = Timestamp.from(java.time.Instant.parse("2015-01-01T00:00:00.000Z"))
    assert(eval("date('yyyyMMdd', $1)", "", "20150101") == testDate)
    assert(eval("date('yyyy-MM-dd\\'T\\'HH:mm:ss.SSSSSS', $1)", "", "2015-01-01T00:00:00.000000") == testDate)
    assert(eval("datetime($1)", "", "2015-01-01T00:00:00.000Z") == testDate)
    assert(eval("dateTime($1)", "", "2015-01-01T00:00:00.000Z") == testDate)
    assert(eval("isodate($1)", "", "20150101") == testDate)
    assert(eval("basicDate($1)", "", "20150101") == testDate)
    assert(eval("isodatetime($1)", "", "20150101T000000.000Z") == testDate)
    assert(eval("basicDateTime($1)", "", "20150101T000000.000Z") == testDate)
    assert(eval("basicDateTimeNoMillis($1)", "", "20150101T000000Z") == testDate)
    assert(eval("dateHourMinuteSecondMillis($1)", "", "2015-01-01T00:00:00.000") == testDate)
    assert(eval("millisToDate($1)", "", testDate.getTime) == testDate)
    assert(eval("secsToDate($1)", "", testDate.getTime / 1000L) == testDate)
    assert(eval("dateToString('yyyy-MM-dd', millisToDate($1))", "", testDate.getTime) == "2015-01-01")
    assert(eval("datetime(printf('%s-%s-%sT00:00:00.000Z', $1, $2, $3))", "", "2015", "01", "01") == testDate)
  }

  test("geometry functions yield WKB like the rest of the engine (reference :287-330)") {
    import graft.geom.{GeomOps => G}
    def g(v: Any): String = G.toWkt(G.fromWkb(v.asInstanceOf[Array[Byte]]))
    assert(g(eval("point($1, $2)", "", 45.0, 45.0)) == "POINT (45 45)")
    assert(g(eval("point($0)", "POINT(50 52)")) == "POINT (50 52)")
    assert(g(eval("multipoint($0)", "Multipoint((45.0 45.0), (50 52))")) == "MULTIPOINT ((45 45), (50 52))")
    assert(g(eval("linestring($0)", "Linestring(102 0, 103 1)")) == "LINESTRING (102 0, 103 1)")
    assert(g(eval("geometry($0)", "POINT(1 2)")) == "POINT (1 2)")
  }

  test("id/hash functions (reference :340-365)") {
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("row,of,data".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(eval("md5($0)", "row,of,data") == md5hex)
    assert(eval("base64($0)", "foo") ==
      java.util.Base64.getEncoder.encodeToString("foo".getBytes("UTF-8")))
    val u = eval("uuid()").toString
    assert(java.util.UUID.fromString(u) != null)
  }

  test("math (reference :496-556)") {
    assert(eval("add($1,$2)", "", "1", "2") == 3.0)
    assert(eval("add($1,$2,$3)", "", "-1", "2", "3.0") == 4.0)
    assert(eval("multiply($1,$2,$3)", "", "-1", "2", "3.0") == -6.0)
    assert(eval("subtract($1,$2,$3)", "", "1", "2", "3.0") == -4.0)
    assert(eval("divide($1,$2,$3)", "", "-1", "2", "3.0") == (-1.0 / 2 / 3))
    assert(eval("mean($1,$2,$3,$4)", "", "1", "2", "3", "4") == 2.5)
    assert(eval("min($1,$2,$3,$4)::int", "", "1", "2", "3", "4") == 1)
    assert(eval("max($1,$2,$3,$4)::int", "", "1", "2", "3", "4") == 4)
    assert(eval("printf('%.2f', divide($1,$2,$3))", "", "-1", "2", "3.0") == "-0.17")
    assert(eval("printf('%.2f', divide(-1, 2, 3))") == "-0.17")
  }

  test("error handling: try + stringTo defaults (reference :431-494, :559-650)") {
    assert(eval("try(secsToDate($1), null)", "", 100L) ==
      new Timestamp(100000L))
    assert(eval("try(secsToDate($1), null)", "", "abcd") == null)
    assert(eval("stringToInt($1, 0)", "", "1") == 1)
    assert(eval("stringToInt($1, 0)", "", "") == 0)
    assert(eval("stringToInteger($1, null)", "", "abcd") == null)
    assert(eval("stringToLong($1, 0L)", "", "158024") == 158024L)
    assert(eval("stringToDouble($1, 0.0)", "", "1.2") == 1.2)
    assert(eval("stringToDouble($1, null)", "", "") == null)
    assert(eval("stringToBoolean($1, false)", "", "true") == true)
    assert(eval("stringToBoolean($1, null)", "", "18") == null)
    // ::casts must be catchable by try() under ANSI mode (a plain cast
    // would THROW on malformed input before coalesce ever sees a null)
    assert(eval("try($1::int, 0)", "", "abcd") == 0)
    assert(eval("try($1::double, -1.0)", "", "12x") == -1.0)
    assert(eval("try($1::int, 0)", "", "17") == 17)
  }

  test("predicates (reference :653-740)") {
    assert(eval("strEq($1, $2)", "", "1", "1") == true)
    assert(eval("intEq($1::int, $2::int)", "", "1", "2") == false)
    assert(eval("lteq($1::int, $2::int)", "", "1", "2") == true)
    assert(eval("gt($1::double, $2::double)", "", "2.0", "1.0") == true)
    assert(eval("not(strEq($1, $2))", "", "1", "2") == true)
    assert(eval("and(strEq($1, $1), strEq($2, $2))", "", "1", "2") == true)
    assert(eval("or(strEq($1, $2), strEq($1, $1))", "", "1", "2") == true)
  }

  test("delimited binding: $0 is the line, $N the token; runs inside a scan") {
    import spark.implicits._
    val lines = Seq("alpha, 10 ,2015-01-01", "beta, 20 ,2015-06-15").toDF("value")
    val out = lines.select(
      Transformers.forDelimited("uppercase(trim($1))", col("value")).as("name"),
      Transformers.forDelimited("add(trim($2), 5)::int", col("value")).as("v"),
      Transformers.forDelimited("date('yyyy-MM-dd', trim($3))", col("value")).as("d"))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ALPHA", "BETA"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(15, 25))
    assert(rows.map(_.getTimestamp(2)).forall(_ != null))
    // the whole transform is Catalyst columns: no ScalaUDF in the plan
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("unknown functions and unterminated strings fail loudly") {
    intercept[IllegalArgumentException](Transformers.compile("nope($1)", _ => lit("")))
    intercept[IllegalArgumentException](Transformers.compile("'abc", _ => lit("")))
  }

  test("avroPath: nested access, array field-predicate selection, ignored " +
    "union tag (AvroPathTest fixture shape)") {
    import spark.implicits._
    // the reference's TObj record: content.kvmap = [{k,v}...] with
    // k=lat -> v=45.0 (AvroPathTest:46-72)
    val df = Seq(1).toDF("one").select(struct(
      struct(array(
        struct(lit("lat").as("k"), lit(45.0).as("v")),
        struct(lit("lon").as("k"), lit(-90.0).as("v")),
        struct(lit("prop3").as("k"), lit(10.0).as("v")),
        struct(lit("prop4").as("k"), lit(1.0).as("v")),
        struct(lit("prop5").as("k"), lit(2.0).as("v"))).as("kvmap")).as("content")).as("rec"))

    assert(df.select(AvroPath.column("/rec/content/kvmap[$k=lat]/v")).head.getDouble(0) == 45.0)
    // union tag is schema-resolved in Spark; the tag parses and no-ops
    assert(df.select(AvroPath.column("/rec/content$type=TObj/kvmap[$k=lon]/v")).head.getDouble(0) == -90.0)
    // nested record array selection without the field step
    assert(df.select(size(AvroPath.column("/rec/content/kvmap"))).head.getInt(0) == 5)
    // no match -> null, the reference's None
    assert(df.select(AvroPath.column("/rec/content/kvmap[$k=absent]/v")).head.isNullAt(0))

    // the transform-language form over a record argument
    val viaTransform = df.select(
      Transformers.compile("avroPath($1, '/content/kvmap[$k=lat]/v')",
        { case 1 => col("rec") }).as("v"))
    assert(viaTransform.as[Double].head() == 45.0)
    intercept[IllegalArgumentException](AvroPath.column("nope"))
  }
}
