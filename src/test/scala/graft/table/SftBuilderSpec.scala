package graft.table

import java.util.{Date, UUID}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Ports the reference's SftBuilderTest (geomesa-utils/.../geotools/
  * SftBuilderTest.scala:27-219). */
class SftBuilderSpec extends AnyFunSuite with Matchers {

  test("build simple types") {
    new SftBuilder().intType("i").longType("l").floatType("f").doubleType("d")
      .stringType("s").getSpec shouldBe "i:Integer,l:Long,f:Float,d:Double,s:String"
  }

  test("handle date and uuid types") {
    new SftBuilder().date("d").uuid("u").getSpec shouldBe "d:Date,u:UUID"
  }

  test("provide index when set to true") {
    val spec = new SftBuilder()
      .intType("i", index = true)
      .longType("l", index = true)
      .floatType("f", index = true)
      .doubleType("d", index = true)
      .stringType("s", index = true)
      .date("dt", SftBuilder.Opts(index = true))
      .uuid("u", index = true)
      .getSpec
    spec shouldBe "i:Integer,l:Long,f:Float,d:Double,s:String,dt:Date,u:UUID"
      .split(",").map(_ + ":index=true").mkString(",")
  }

  test("work with foldLeft") {
    val builder = ('a' to 'z').foldLeft(new SftBuilder()) { case (b, name) =>
      b.stringType(name.toString)
    }
    builder.getSpec shouldBe ('a' to 'z').map(c => s"$c:String").mkString(",")
    val sft = builder.build("foobar")
    sft.fields should have length 26
    sft.fields.map(_.name) shouldBe ('a' to 'z').map(_.toString)
  }

  test("set default dtg correctly") {
    new SftBuilder().date("foobar", default = true)
      .build("foobar").defaultDate shouldBe Some("foobar")
    new SftBuilder().date("foobar").withDefaultDtg("foobar")
      .build("foobar").defaultDate shouldBe Some("foobar")
    new SftBuilder().date("foobar").date("dtg").withDefaultDtg("foobar")
      .build("foobar").defaultDate shouldBe Some("foobar")
    new SftBuilder().date("dtg").date("foobar").withDefaultDtg("foobar")
      .build("foobar").defaultDate shouldBe Some("foobar")
    new SftBuilder().date("dtg").date("foobar", default = true)
      .build("foobar").defaultDate shouldBe Some("foobar")
  }

  test("build lists (Scala and Java element types keep their names)") {
    val b = new SftBuilder()
      .listType[Int]("i").listType[Long]("l").listType[Float]("f")
      .listType[Double]("d").listType[String]("s").listType[Date]("dt").listType[UUID]("u")
    b.getSpec shouldBe List("i" -> "Int", "l" -> "Long", "f" -> "Float", "d" -> "Double",
      "s" -> "String", "dt" -> "Date", "u" -> "UUID")
      .map { case (k, v) => s"$k:List[$v]" }.mkString(",")
    b.build("foobar").fields should have length 7

    new SftBuilder().listType[java.lang.Integer]("i").getSpec shouldBe "i:List[Integer]"
  }

  test("build maps, including mixed key/value types") {
    val b = new SftBuilder()
      .mapType[Int, String]("a").mapType[Long, UUID]("b").mapType[Date, Float]("c")
    b.getSpec shouldBe "a:Map[Int,String],b:Map[Long,UUID],c:Map[Date,Float]"
    b.build("foobar").fields should have length 3
  }

  test("handle multiple geoms — default geometry marked and indexed") {
    val b = new SftBuilder()
      .geometry("geom")
      .point("foobar", default = true)
      .multiLineString("mls")
    b.getSpec shouldBe
      "geom:Geometry:srid=4326,*foobar:Point:srid=4326:index=true:index-value=true,mls:MultiLineString:srid=4326"
    val sft = b.build("foobar")
    sft.fields should have length 3
    sft.defaultGeometry shouldBe Some("foobar")
  }

  test("handle Bytes type") {
    new SftBuilder().stringType("a").bytes("b").getSpec shouldBe "a:String,b:Bytes"
    new SftBuilder().listType[Array[Byte]]("lst").getSpec shouldBe "lst:List[Bytes]"
    new SftBuilder().mapType[String, Array[Byte]]("m").getSpec shouldBe "m:Map[String,Bytes]"
    new SftBuilder().mapType[Array[Byte], Array[Byte]]("m2").getSpec shouldBe "m2:Map[Bytes,Bytes]"
  }
}
