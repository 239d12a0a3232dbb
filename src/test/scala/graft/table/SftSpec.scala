package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Ported from the reference's SimpleFeatureTypesTest
  * (geomesa-utils/.../geotools/SimpleFeatureTypesTest.scala:35-265) —
  * the spec-string grammar every reference config names schemas in. */
class SftSpec extends AnyFunSuite {

  test("create an sft: attributes, default geom, canonical encode") {
    val sft = Sft.parse("testing", "id:Integer,dtg:Date,*geom:Point:srid=4326:index=true")
    assert(sft.typeName == "testing")
    assert(sft.fields.size == 3)
    assert(sft.fields.head.option("index").isEmpty) // id not indexed
    assert(sft.defaultGeometry.contains("geom"))
    // index flag never encodes for geometries; * carries the default marker
    assert(sft.encode() == "id:Integer,dtg:Date,*geom:Point:srid=4326")
    // non-geomesa user data is excluded; geomesa keys + derived dtg included
    val withUd = sft.copy(userData = Seq("geomesa.table.sharing" -> "true", "hello" -> "goodbye"))
    val encoded = withUd.encode(includeUserData = true)
    assert(encoded.startsWith("id:Integer,dtg:Date,*geom:Point:srid=4326;"))
    assert(encoded.contains("geomesa.index.dtg='dtg'"))
    assert(encoded.contains("geomesa.table.sharing='true'"))
    assert(!encoded.contains("hello="))
    // declared prefixes opt extra keys in
    val withPrefix = withUd.copy(userData = ("geomesa.user-data.prefix" -> "hello") +: withUd.userData)
    assert(withPrefix.encode(includeUserData = true).contains("hello='goodbye'"))
  }

  test("empty type, empty type with user data") {
    assert(Sft.parse("test", "").fields.isEmpty)
    val sft = Sft.parse("test", ";geomesa.table.sharing='true'")
    assert(sft.fields.isEmpty)
    assert(sft.userDataMap("geomesa.table.sharing") == "true")
  }

  test("namespaces: simple, complex, invalid") {
    val s1 = Sft.parse("ns:testing", "dtg:Date,*geom:Point:srid=4326")
    assert(s1.namespace.contains("ns") && s1.typeName == "testing")
    val s2 = Sft.parse("http://geomesa/ns:testing", "dtg:Date,*geom:Point:srid=4326")
    assert(s2.namespace.contains("http://geomesa/ns") && s2.typeName == "testing")
    val s3 = Sft.parse("http://geomesa/ns:testing:", "dtg:Date,*geom:Point:srid=4326")
    assert(s3.namespace.isEmpty && s3.typeName == "http://geomesa/ns:testing:")
  }

  test("empty srid defaults to 4326; non-4326 rejected") {
    val sft = Sft.parse("testing", "id:Integer:index=false,*geom:Point:index=true")
    val geom = sft.schema("geom")
    assert(geom.metadata.getLong("sft.srid") == 4326L)
    intercept[IllegalArgumentException](Sft.parse("t", "*geom:Point:srid=3857"))
  }

  test("Int vs Integer aliases") {
    assert(Sft.parse("t1", "foo:Int,*geom:Point:index=true").fields.size == 2)
    assert(Sft.parse("t2", "foo:Integer,*geom:Point:index=true").fields.size == 2)
    assert(Sft.parse("t1", "foo:Int").fields.head.typeName == "Integer")
  }

  test("no explicit default geometry: first geometry wins") {
    val sft = Sft.parse("testing", "id:Integer,geom:Point:index=true,geom2:Geometry")
    assert(sft.defaultGeometry.contains("geom"))
  }

  test("secondary indexed attributes exclude the default geometry") {
    val sft = Sft.parse("testing",
      "id:Integer:index=false,dtg:Date:index=true,*geom:Point:srid=4326:index=true")
    assert(sft.secondaryIndexed == Seq("dtg"))
  }

  test("list types: default item String, defined values, canonical encode, illegal specs") {
    val sft = Sft.parse("testing", "id:Integer,names:List,dtg:Date,*geom:Point:srid=4326")
    assert(sft.fields.size == 4)
    assert(sft.schema("names").dataType == ArrayType(StringType))
    assert(sft.encode() == "id:Integer,names:List[String],dtg:Date,*geom:Point:srid=4326")

    val d = Sft.parse("testing", "id:Integer,names:List[Double],dtg:Date,*geom:Point:srid=4326")
    assert(d.schema("names").dataType == ArrayType(DoubleType))
    assert(d.encode() == "id:Integer,names:List[Double],dtg:Date,*geom:Point:srid=4326")

    intercept[IllegalArgumentException](
      Sft.parse("testing", "id:Integer,names:List[Double][Double],dtg:Date,*geom:Point:srid=4326"))
    intercept[IllegalArgumentException](
      Sft.parse("testing", "id:Integer,names:List[FAKE],dtg:Date,*geom:Point:srid=4326"))
  }

  test("map types: defaults, defined values, byte values, illegal specs") {
    val sft = Sft.parse("testing", "id:Integer,metadata:Map,dtg:Date,*geom:Point:srid=4326")
    assert(sft.schema("metadata").dataType == MapType(StringType, StringType))
    assert(sft.encode() == "id:Integer,metadata:Map[String,String],dtg:Date,*geom:Point:srid=4326")

    val d = Sft.parse("testing", "id:Integer,metadata:Map[Double,String],dtg:Date,*geom:Point:srid=4326")
    assert(d.schema("metadata").dataType == MapType(DoubleType, StringType))
    assert(d.encode() == "id:Integer,metadata:Map[Double,String],dtg:Date,*geom:Point:srid=4326")

    val b = Sft.parse("testing", "byteMap:Map[String,Bytes]")
    assert(b.schema("byteMap").dataType == MapType(StringType, BinaryType))
    assert(b.encode() == "byteMap:Map[String,Bytes]")

    intercept[IllegalArgumentException](
      Sft.parse("testing", "id:Integer,metadata:Map[String],dtg:Date,*geom:Point:srid=4326"))
    intercept[IllegalArgumentException](
      Sft.parse("testing", "id:Integer,metadata:Map[String,FAKE],dtg:Date,*geom:Point:srid=4326"))
  }

  test("splitter options and enabled indexes (quoted commas survive)") {
    val spec = "name:String,dtg:Date,*geom:Point:srid=4326;" +
      "table.splitter.class=x.y.DigitSplitter,table.splitter.options='fmt:%02d,min:0,max:99'," +
      "geomesa.indices.enabled='z3,z2,attr'"
    val sft = Sft.parse("test", spec)
    assert(sft.userDataMap("table.splitter.class") == "x.y.DigitSplitter")
    assert(sft.userDataMap("table.splitter.options") == "fmt:%02d,min:0,max:99")
    assert(sft.enabledIndices == Seq("z3", "z2", "attr"))
  }

  test("Spark schema mapping: every simple type lands on the natural Spark type") {
    val sft = Sft.parse("t",
      "s:String,i:Integer,l:Long,d:Double,f:Float,b:Boolean,u:UUID,dt:Date,ts:Timestamp,by:Bytes")
    val m = sft.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(m == Map("s" -> StringType, "i" -> IntegerType, "l" -> LongType,
      "d" -> DoubleType, "f" -> FloatType, "b" -> BooleanType, "u" -> StringType,
      "dt" -> TimestampType, "ts" -> TimestampType, "by" -> BinaryType))
  }

  test("geometry columns carry sft metadata and round-trip via fromSchema") {
    val sft = Sft.parse("t", "id:Integer,dtg:Date:index=true,*geom:Point:srid=4326")
    val schema = sft.schema
    assert(schema("geom").dataType == BinaryType)
    assert(schema("geom").metadata.getString("sft.geom") == "Point")
    assert(schema("geom").metadata.getBoolean("sft.default"))
    val back = Sft.fromSchema("t", schema)
    assert(back.encode() == "id:Integer,dtg:Date:index=true,*geom:Point:srid=4326")
    assert(back.defaultGeometry.contains("geom"))
    assert(back.secondaryIndexed == Seq("dtg"))
  }

  test("defaultDate: user data beats first-Date; falls back to first Date attr") {
    val sft = Sft.parse("t", "a:Date,b:Date;geomesa.index.dtg='b'")
    assert(sft.defaultDate.contains("b"))
    assert(Sft.parse("t", "a:Date,b:Date").defaultDate.contains("a"))
  }

  // TemporalIndexCheckTest (accumulo index/TemporalIndexCheckTest.scala:
  // 20-112): dtg detection + validation at schema load
  test("TemporalIndexCheck: dtg key validation and detection") {
    val noDtg = "foo:String,bar:Geometry,baz:String,geom:Point"
    val oneDtg = s"$noDtg,dtg:Date"
    val twoDtg = s"$oneDtg,dtg_end_time:Date"
    // no valid DTG
    assert(Sft.parse("t", noDtg).defaultDate.isEmpty)
    // no valid DTG even if the key is set (incorrectly — no Date attrs)
    assert(Sft.parse("t", s"$noDtg;geomesa.index.dtg='dtg'").defaultDate.isEmpty)
    // valid DTG detected when the key is unset
    assert(Sft.parse("t", oneDtg).defaultDate.contains("dtg"))
    // valid DTG detected when the key names a missing attribute
    assert(Sft.parse("t", s"$oneDtg;geomesa.index.dtg='no_such_dtg'").defaultDate.contains("dtg"))
    // key set properly stays
    assert(Sft.parse("t", s"$oneDtg;geomesa.index.dtg='dtg'").defaultDate.contains("dtg"))
    // two candidates + bad key -> first Date attribute
    assert(Sft.parse("t", s"$twoDtg;geomesa.index.dtg='no_such_dtg'").defaultDate.contains("dtg"))
    // key properly set with multiple Date attributes stays
    assert(Sft.parse("t", s"$twoDtg;geomesa.index.dtg='dtg_end_time'").defaultDate.contains("dtg_end_time"))
    // a key naming a non-Date attribute is invalid -> detection
    assert(Sft.parse("t", s"$oneDtg;geomesa.index.dtg='foo'").defaultDate.contains("dtg"))
    // setDtgField analog: valid name sticks, invalid throws
    assert(Sft.parse("t", oneDtg).withDtgField("dtg").defaultDate.contains("dtg"))
    intercept[IllegalArgumentException](Sft.parse("t", noDtg).withDtgField("dtg"))
    intercept[IllegalArgumentException](Sft.parse("t", oneDtg).withDtgField("foo"))
  }

  // FeatureUtils.ReservedWords (geomesa-utils geotools/FeatureUtils.scala:
  // 26-134; docs reserved_words.rst): TABLE creation rejects attribute
  // names that collide with the CQL grammar, case-insensitively, unless
  // override.reserved.words='true'. Spec parsing itself accepts them
  // (the reference's SimpleFeatureTypesTest uses id:Integer freely).
  test("reserved words: flagged on the schema, rejected at table creation, overridable") {
    // parse never rejects
    val loc = Sft.parse("t", "location:String,geom:Point")
    assert(Sft.reservedWords(loc) == Seq("LOCATION"))
    assert(Sft.reservedWords(Sft.parse("t", "Point:String")) == Seq("POINT"))
    assert(Sft.reservedWords(Sft.parse("t", "name:String,geom:Point")).isEmpty)
    // the createSchema-time check
    val e = intercept[IllegalArgumentException](Sft.validateReservedWords(loc))
    assert(e.getMessage.contains("LOCATION"))
    Sft.validateReservedWords(Sft.parse("t", "name:String,geom:Point"))
    Sft.validateReservedWords(
      Sft.parse("t", "location:String,geom:Point;override.reserved.words='true'"))
  }
}
