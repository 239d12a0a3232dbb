package graft.functions

import graft.SparkTest
import graft.plans.Cql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Ports the reference's JSON-path suites:
 *
 *  - JsonPathParserTest (geomesa-feature-kryo json/JsonPathParserTest
 *    .scala:20-88): the grammar, element for element.
 *  - KryoJsonSerializationTest "correctly deserialize json-path"
 *    (:92-128): evaluation semantics over a GeoJSON-ish document —
 *    null / scalar / Seq result shape, wildcard + deep-scan match
 *    order, array slicing, length().
 *  - JsonPathFilterFunctionTest (:25-140): the ECQL jsonPath()
 *    function over every quoting/bracketing form, driven through the
 *    CQL surface here.
 */
class JsonPathSpec extends AnyFunSuite with Matchers with SparkTest {

  import JsonPath._

  // ---- JsonPathParserTest ----------------------------------------------

  test("not parse invalid paths") {
    an[IllegalArgumentException] should be thrownBy JsonPath.parse("$.$")
    an[IllegalArgumentException] should be thrownBy JsonPath.parse("$.foo foo")
  }

  test("correctly parse attribute paths") {
    JsonPath.parse("$.foo") shouldBe Seq(PathAttribute("foo"))
  }

  test("correctly parse attribute bracket paths") {
    JsonPath.parse("$[foo]") shouldBe Seq(PathAttribute("foo", bracketed = true))
    JsonPath.parse("$[foo_bar]") shouldBe Seq(PathAttribute("foo_bar", bracketed = true))
    JsonPath.parse("$['foo']") shouldBe Seq(PathAttribute("foo", bracketed = true))
    JsonPath.parse("$['foo_bar']") shouldBe Seq(PathAttribute("foo_bar", bracketed = true))
    JsonPath.parse("$['foo-bar 0']") shouldBe Seq(PathAttribute("foo-bar 0", bracketed = true))
  }

  test("correctly parse array index paths") {
    JsonPath.parse("$.foo[2]") shouldBe Seq(PathAttribute("foo"), PathIndex(2))
  }

  test("correctly parse multiple array index paths") {
    JsonPath.parse("$.foo[2,3,4]") shouldBe Seq(PathAttribute("foo"), PathIndices(Seq(2, 3, 4)))
  }

  test("correctly parse array index range paths") {
    JsonPath.parse("$.foo[2:4]") shouldBe Seq(PathAttribute("foo"), PathIndices(Seq(2, 3)))
  }

  test("correctly parse wildcards in attribute paths") {
    JsonPath.parse("$.foo.*.name") shouldBe
      Seq(PathAttribute("foo"), PathAttributeWildCard, PathAttribute("name"))
  }

  test("correctly parse wildcards in array index paths") {
    JsonPath.parse("$.foo[*]") shouldBe Seq(PathAttribute("foo"), PathIndexWildCard)
  }

  test("correctly parse deep scan attributes") {
    JsonPath.parse("$..foo[0]") shouldBe Seq(PathDeepScan, PathAttribute("foo"), PathIndex(0))
  }

  test("correctly parse deep scan wildcards") {
    JsonPath.parse("$..*") shouldBe Seq(PathDeepScan, PathAttributeWildCard)
  }

  test("correctly parse nested deep scans") {
    JsonPath.parse("$.foo..bar") shouldBe
      Seq(PathAttribute("foo"), PathDeepScan, PathAttribute("bar"))
  }

  test("deep scan over a bracketed attribute is ONE scan, not two") {
    JsonPath.parse("$..['x']") shouldBe
      Seq(PathDeepScan, PathAttribute("x", bracketed = true))
    JsonPath.parse("$.a..['x.y']") shouldBe
      Seq(PathAttribute("a"), PathDeepScan, PathAttribute("x.y", bracketed = true))
    // without the scan dot, `.['x']` is the grammar's DeepScan
    // alternative (JsonPathParser.scala:116), same as the reference
    JsonPath.parse("$.a.['x']") shouldBe
      Seq(PathAttribute("a"), PathDeepScan, PathAttribute("x", bracketed = true))
    // $..['x'] on nested dupes: one scan yields each match once
    val j = """{"x":1,"b":{"x":2}}"""
    JsonPath.evaluate(j, JsonPath.parse("$..['x']")) shouldBe Seq(1, 2)
  }

  test("correctly parse functions") {
    JsonPath.parse("$.foo.length()") shouldBe Seq(PathAttribute("foo"), PathFunction("length"))
    JsonPath.parse("$.foo.min()") shouldBe Seq(PathAttribute("foo"), PathFunction("min"))
    an[IllegalArgumentException] should be thrownBy JsonPath.parse("$.foo.count()")
    an[IllegalArgumentException] should be thrownBy JsonPath.parse("$.foo.length().bar")
    an[IllegalArgumentException] should be thrownBy JsonPath.parse("$.foo..")
  }

  // ---- KryoJsonSerializationTest evaluation fixture ----------------------

  private val doc =
    """{
      |  "type": "Feature",
      |  "geometry": {
      |    "type": "Point",
      |    "coordinates": [30, 10]
      |  },
      |  "properties": {
      |    "type": 20,
      |    "prop0": "value0",
      |    "prop1": {
      |      "this": "that"
      |    }
      |  }
      |}""".stripMargin

  private def eval(path: String): Any = JsonPath.evaluate(doc, JsonPath.parse(path))

  test("correctly evaluate json-path (reference kryo-json fixture values)") {
    assert(eval("$.foo") == null)
    eval("$.type") shouldBe "Feature"
    eval("$.geometry.type") shouldBe "Point"
    eval("$.geometry.*") shouldBe Seq("Point", Seq(30, 10))
    eval("$.geometry.coordinates") shouldBe Seq(30, 10)
    eval("$.geometry.coordinates[0]") shouldBe 30
    eval("$.geometry.coordinates[0,1]") shouldBe Seq(30, 10)
    eval("$.*.type") shouldBe Seq("Point", 20)
    eval("$.geometry.coordinates[*]") shouldBe Seq(30, 10)
    eval("$.geometry.coordinates.length()") shouldBe 2
    eval("$..type") shouldBe Seq("Feature", "Point", 20)
    eval("$.properties..*") shouldBe Seq(20, "value0", """{"this":"that"}""", "that")
  }

  test("path functions: min/max/avg over numeric arrays; length of strings") {
    eval("$.geometry.coordinates.min()") shouldBe 10.0
    eval("$.geometry.coordinates.max()") shouldBe 30.0
    eval("$.geometry.coordinates.avg()") shouldBe 20.0
    eval("$.type.length()") shouldBe 7 // "Feature"
    eval("$.geometry.type.length()") shouldBe 5
    // non-numeric elements degrade to null, never a per-row throw
    val mixed = """{"vals":["a","b"],"nums":[1,null,3]}"""
    assert(JsonPath.evaluate(mixed, JsonPath.parse("$.vals.min()")) == null)
    assert(JsonPath.evaluate(mixed, JsonPath.parse("$.vals.max()")) == null)
    // reference toNum parity: null coerces to 0.0 inside a numeric array
    JsonPath.evaluate(mixed, JsonPath.parse("$.nums.min()")) shouldBe 0.0
  }

  test("deep scan match order is breadth-first like the reference's queue walk") {
    val nested = """{"a":{"b":{"type":"deep"}},"c":{"type":"shallow"}}"""
    // BFS: root, a, c, a.b — so c's type comes before a.b's
    JsonPath.evaluate(nested, JsonPath.parse("$..type")) shouldBe Seq("shallow", "deep")
  }

  test("malformed json and null input evaluate to null, not an error") {
    assert(JsonPath.evaluate("{not json", JsonPath.parse("$.a")) == null)
    assert(JsonPath.evaluate(null, JsonPath.parse("$.a")) == null)
  }

  test("render: scalars unquoted, containers and multi-match as compact JSON") {
    def r(p: String): String = JsonPath.render(doc, JsonPath.parse(p))
    r("$.type") shouldBe "Feature"
    r("$.geometry.coordinates") shouldBe "[30,10]"
    r("$.geometry.coordinates[*]") shouldBe "[30,10]"
    r("$..type") shouldBe """["Feature","Point",20]"""
    r("$.properties.prop1") shouldBe """{"this":"that"}"""
    r("$.geometry.coordinates.avg()") shouldBe "20.0"
    r("$.foo") shouldBe null
  }

  // ---- JsonPathFilterFunctionTest through the CQL surface ---------------

  private val filterJson =
    """{
      |  "foo" : "bar",
      |  "foo.foo" : "bar",
      |  "foo foo" : "bar",
      |  "foo_foo" : "bar",
      |  "bar" : { "boo" : "hiss", "boo.boo" : "hiss", "boo boo" : "hiss", "boo_boo" : "hiss" },
      |  "bar.bar" : { "boo" : "hiss", "boo.boo" : "hiss", "boo boo" : "hiss", "boo_boo" : "hiss" },
      |  "bar bar" : { "boo" : "hiss", "boo.boo" : "hiss", "boo boo" : "hiss", "boo_boo" : "hiss" },
      |  "bar_bar" : { "boo" : "hiss", "boo.boo" : "hiss", "boo boo" : "hiss", "boo_boo" : "hiss" }
      |}""".stripMargin

  private def cqlTrue(filter: String): Boolean = {
    import spark.implicits._
    val df = Seq(1L).toDF("id").withColumn("json", lit(filterJson))
    Cql.filter(df, filter).count() == 1
  }

  test("CQL jsonPath: every quoting/bracketing form from JsonPathFilterFunctionTest") {
    // root attribute
    assert(cqlTrue("jsonPath('$.json.foo') = 'bar'"))
    // nested lookup of a non-object is simply false, not an error
    assert(!cqlTrue("jsonPath('$.json.foo.foo') = 'bar'"))
    // invalid path: space in a bare attribute
    an[RuntimeException] should be thrownBy cqlTrue("jsonPath('$.json.foo foo') = 'bar'")
    // period in name (both .['x'] and ['x'] forms)
    assert(cqlTrue("jsonPath('$.json.[''foo.foo'']') = 'bar'"))
    assert(cqlTrue("jsonPath('$.json[''foo.foo'']') = 'bar'"))
    // space in name
    assert(cqlTrue("jsonPath('$.json.[''foo foo'']') = 'bar'"))
    assert(cqlTrue("jsonPath('$.json[''foo foo'']') = 'bar'"))
    // underscore in name
    assert(cqlTrue("jsonPath('$.json.[''foo_foo'']') = 'bar'"))
    assert(cqlTrue("jsonPath('$.json[''foo_foo'']') = 'bar'"))
    assert(cqlTrue("jsonPath('$.json.foo_foo') = 'bar'"))
    // sub attributes, all bracket combinations
    for (p <- Seq("$.json.bar.boo", "$.json.bar.['boo']", "$.json.bar['boo']",
                  "$.json.['bar'].boo", "$.json.['bar'].['boo']", "$.json.['bar']['boo']",
                  "$.json['bar'].boo", "$.json['bar'].['boo']", "$.json['bar']['boo']")) {
      val escaped = p.replace("'", "''")
      assert(cqlTrue(s"jsonPath('$escaped') = 'hiss'"), p)
    }
    // period/space/underscore in sub attribute names
    for (p <- Seq("$.json.bar.['boo.boo']", "$.json.bar['boo.boo']",
                  "$.json.bar.['boo boo']", "$.json.bar['boo boo']",
                  "$.json.bar.['boo_boo']", "$.json.bar['boo_boo']", "$.json.bar.boo_boo",
                  "$.json.['bar.bar'].boo", "$.json['bar.bar'].boo",
                  "$.json.['bar.bar'].['boo.boo']", "$.json.['bar.bar']['boo.boo']",
                  "$.json['bar.bar'].['boo.boo']", "$.json['bar.bar']['boo.boo']",
                  "$.json.['bar bar'].['boo boo']", "$.json['bar bar']['boo boo']",
                  "$.json.bar_bar.boo_boo", "$.json['bar_bar'].['boo_boo']")) {
      val escaped = p.replace("'", "''")
      assert(cqlTrue(s"jsonPath('$escaped') = 'hiss'"), p)
    }
  }

  test("CQL jsonPath: indefinite paths (deep scan, wildcard, function) evaluate per row") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"a":{"vals":[1,2,3]},"b":{"vals":[4,5]}}"""),
      (2L, """{"a":{"vals":[10]}}""")).toDF("id", "json")
    Cql.filter(df, "jsonPath('$.json.a.vals.length()') = 3")
      .select("id").as[Long].collect().toSet shouldBe Set(1L)
    Cql.filter(df, "jsonPath('$.json.a.vals.max()') = 10.0")
      .select("id").as[Long].collect().toSet shouldBe Set(2L)
    // the first segment must name the attribute, like the reference's
    // JsonPathPropertyAccessor — a leading deep scan is a parse error
    an[RuntimeException] should be thrownBy Cql.filter(df, "jsonPath('$..json') IS NOT NULL").count()
    // deep scan: all vals arrays' first elements, rendered as JSON
    Cql.filter(df, "jsonPath('$.json..vals[0]') = '[1,4]'")
      .select("id").as[Long].collect().toSet shouldBe Set(1L)
  }
}
