package graft.table

import scala.reflect.runtime.universe._

/** Fluent feature-type builder — the reference's SftBuilder
  * (geomesa-utils/.../geotools/SftBuilder.scala:24-200): a programmatic
  * alternative to spec strings that composes (and round-trips through)
  * the same spec grammar [[Sft.parse]] consumes. Type parameters map to
  * the reference's canonical names: scala.Int -> "Int" but
  * java.lang.Integer -> "Integer" (SftBuilderTest "build lists with
  * Java Types"), Array[Byte] -> "Bytes". */
final class SftBuilder {

  import SftBuilder.Opts

  private val entries = Seq.newBuilder[String]
  private var defaultDtg: Option[String] = None

  private def append(name: String, opts: Opts, typeName: String): SftBuilder = {
    val suffix = (if (opts.index) ":index=true" else "") ++
      (if (opts.stIndex) ":index-value=true" else "")
    entries += s"$name:$typeName$suffix"
    this
  }

  def stringType(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "String")
  def intType(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "Integer")
  def longType(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "Long")
  def floatType(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "Float")
  def doubleType(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "Double")
  def booleanType(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "Boolean")
  def bytes(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "Bytes")
  def uuid(name: String, index: Boolean = false): SftBuilder = append(name, Opts(index), "UUID")

  def stringType(name: String, opts: Opts): SftBuilder = append(name, opts, "String")
  def intType(name: String, opts: Opts): SftBuilder = append(name, opts, "Integer")
  def date(name: String, opts: Opts): SftBuilder = {
    if (opts.default) defaultDtg = Some(name)
    append(name, opts, "Date")
  }
  def date(name: String, index: Boolean = false, default: Boolean = false): SftBuilder =
    date(name, Opts(index = index, default = default))

  private def appendGeom(name: String, default: Boolean, typeName: String): SftBuilder = {
    // the reference marks the default geometry indexed + index-value
    // (SftBuilderTest "handle multiple geoms")
    val entry =
      if (default) s"*$name:$typeName:srid=4326:index=true:index-value=true"
      else s"$name:$typeName:srid=4326"
    entries += entry
    this
  }
  def point(name: String, default: Boolean = false): SftBuilder = appendGeom(name, default, "Point")
  def lineString(name: String, default: Boolean = false): SftBuilder = appendGeom(name, default, "LineString")
  def polygon(name: String, default: Boolean = false): SftBuilder = appendGeom(name, default, "Polygon")
  def geometry(name: String, default: Boolean = false): SftBuilder = appendGeom(name, default, "Geometry")
  def multiPoint(name: String, default: Boolean = false): SftBuilder = appendGeom(name, default, "MultiPoint")
  def multiLineString(name: String, default: Boolean = false): SftBuilder = appendGeom(name, default, "MultiLineString")
  def multiPolygon(name: String, default: Boolean = false): SftBuilder = appendGeom(name, default, "MultiPolygon")
  def geometryCollection(name: String, default: Boolean = false): SftBuilder =
    appendGeom(name, default, "GeometryCollection")

  def listType[T: TypeTag](name: String, index: Boolean = false): SftBuilder =
    append(name, Opts(index), s"List[${SftBuilder.canonical(typeOf[T])}]")
  def mapType[K: TypeTag, V: TypeTag](name: String, index: Boolean = false): SftBuilder =
    append(name, Opts(index), s"Map[${SftBuilder.canonical(typeOf[K])},${SftBuilder.canonical(typeOf[V])}]")

  def withDefaultDtg(name: String): SftBuilder = { defaultDtg = Some(name); this }

  /** The accumulated spec string (reference getSpec). */
  def getSpec: String = entries.result().mkString(",")

  /** Parse the accumulated spec into a schema; the default dtg (from
    * `date(default = true)` or `withDefaultDtg`) rides as the
    * `geomesa.index.dtg` user data, like the reference's build. */
  def build(typeName: String): Sft.Schema = {
    val spec = defaultDtg match {
      case Some(d) => s"$getSpec;geomesa.index.dtg=$d"
      case None => getSpec
    }
    Sft.parse(typeName, spec)
  }
}

object SftBuilder {

  final case class Opts(index: Boolean = false, stIndex: Boolean = false, default: Boolean = false)

  /** Scala primitives keep their Scala names; boxed Java types their
    * Java names — the reference's exact mapping. */
  private[table] def canonical(t: Type): String = {
    if (t =:= typeOf[Int]) "Int"
    else if (t =:= typeOf[java.lang.Integer]) "Integer"
    else if (t =:= typeOf[Long] || t =:= typeOf[java.lang.Long]) "Long"
    else if (t =:= typeOf[Float] || t =:= typeOf[java.lang.Float]) "Float"
    else if (t =:= typeOf[Double] || t =:= typeOf[java.lang.Double]) "Double"
    else if (t =:= typeOf[Boolean] || t =:= typeOf[java.lang.Boolean]) "Boolean"
    else if (t =:= typeOf[String] || t =:= typeOf[java.lang.String]) "String"
    else if (t =:= typeOf[java.util.Date]) "Date"
    else if (t =:= typeOf[java.util.UUID]) "UUID"
    else if (t =:= typeOf[Array[Byte]]) "Bytes"
    else throw new IllegalArgumentException(s"no canonical attribute type for $t")
  }
}
