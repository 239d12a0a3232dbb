package graft.table

import org.apache.spark.sql.types._

/**
 * The reference's schema-spec string surface — `SimpleFeatureTypes
 * .createType/encodeType` (geomesa-utils/.../geotools/SimpleFeatureTypes
 * .scala:94-167 over SimpleFeatureSpec.scala:200-280's type tables).
 * Every reference config file, CLI argument and converter definition
 * names its schema in this one-line grammar:
 *
 *   "id:Integer,dtg:Date,*geom:Point:srid=4326;geomesa.table.sharing='true'"
 *
 * Spark-first mapping: an attribute list compiles to a `StructType`
 * (geometries as WKB `BinaryType`, dates as `TimestampType`, List/Map
 * as Array/MapType) with the sft-specific facts — geometry subtype,
 * default-geometry flag, per-attribute options like `index=true` or
 * `cardinality=high` — carried in column `Metadata` under `sft.*` keys,
 * so they survive a DataFrame round-trip and downstream code (index
 * writers, exporters) can read them off the schema itself.
 */
object Sft {

  /** Canonical simple-type names keyed by every accepted alias
    * (SimpleFeatureSpec.scala:228-259). */
  private val simpleAliases: Map[String, String] = Map(
    "String" -> "String", "java.lang.String" -> "String", "string" -> "String",
    "Integer" -> "Integer", "java.lang.Integer" -> "Integer", "int" -> "Integer",
    "Int" -> "Integer", "0" -> "Integer",
    "Long" -> "Long", "java.lang.Long" -> "Long", "long" -> "Long",
    "Double" -> "Double", "java.lang.Double" -> "Double", "double" -> "Double", "0.0" -> "Double",
    "Float" -> "Float", "java.lang.Float" -> "Float", "float" -> "Float", "0.0f" -> "Float",
    "Boolean" -> "Boolean", "java.lang.Boolean" -> "Boolean", "boolean" -> "Boolean",
    "bool" -> "Boolean", "true" -> "Boolean", "false" -> "Boolean",
    "UUID" -> "UUID", "Date" -> "Date", "Timestamp" -> "Timestamp",
    "byte[]" -> "Bytes", "Bytes" -> "Bytes")

  private val geometryNames: Set[String] = Set("Geometry", "Point", "LineString", "Polygon",
    "MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection")

  private def sparkTypeOf(canonical: String): DataType = canonical match {
    case "String" | "UUID" => StringType
    case "Integer" => IntegerType
    case "Long" => LongType
    case "Double" => DoubleType
    case "Float" => FloatType
    case "Boolean" => BooleanType
    case "Date" | "Timestamp" => TimestampType
    case "Bytes" => BinaryType
    case g if geometryNames(g) => BinaryType // WKB
    case l if l.startsWith("List[") =>
      ArrayType(sparkTypeOf(l.stripPrefix("List[").stripSuffix("]")))
    case m if m.startsWith("Map[") =>
      val Array(k, v) = m.stripPrefix("Map[").stripSuffix("]").split(",", 2)
      MapType(sparkTypeOf(k), sparkTypeOf(v))
  }

  /** One parsed attribute: canonical type name + spec options in
    * declaration order. */
  case class Field(name: String, typeName: String, options: Seq[(String, String)],
                   defaultGeom: Boolean) {
    def isGeometry: Boolean = geometryNames(typeName)
    def option(key: String): Option[String] = options.collectFirst { case (k, v) if k == key => v }

    def toStructField: StructField = {
      val mb = new MetadataBuilder().putString("sft.type", typeName)
      if (isGeometry) {
        mb.putString("sft.geom", typeName)
        mb.putLong("sft.srid", option("srid").map(_.toLong).getOrElse(4326L))
        if (defaultGeom) mb.putBoolean("sft.default", true)
      }
      options.foreach { case (k, v) => if (k != "srid") mb.putString(s"sft.opt.$k", v) }
      StructField(name, sparkTypeOf(typeName), nullable = true, mb.build())
    }

    /** Reference encoding — AttributeSpec.toSpec: geometries drop the
      * `default` marker (the `*` carries it) and never encode `index`
      * (SimpleFeatureSpec.scala:170-173). */
    def toSpec: String = {
      val opts = if (isGeometry) options.filterNot(o => o._1 == "index") else options
      val star = if (defaultGeom) "*" else ""
      s"$star$name:$typeName${opts.map { case (k, v) => s":$k=$v" }.mkString}"
    }
  }

  case class Schema(typeName: String, namespace: Option[String], fields: Seq[Field],
                    userData: Seq[(String, String)]) {
    def schema: StructType = StructType(fields.map(_.toStructField))

    /** First `*`-marked geometry, else the first geometry attribute
      * ("handle no explicit geometry" — SimpleFeatureTypesTest:130-133). */
    def defaultGeometry: Option[String] =
      fields.find(_.defaultGeom).orElse(fields.find(_.isGeometry)).map(_.name)

    private def isDateField(f: Field): Boolean =
      f.typeName == "Date" || f.typeName == "Timestamp"

    /** `geomesa.index.dtg` user data — VALIDATED the way the reference's
      * TemporalIndexCheck.validateDtgField does at schema load
      * (index/TemporalIndexCheck.scala; TemporalIndexCheckTest:35-85):
      * a key naming a missing or non-Date attribute is ignored and
      * detection falls back to the first Date attribute; no Date
      * attributes means no dtg, whatever the key says. */
    def defaultDate: Option[String] =
      userData.collectFirst { case ("geomesa.index.dtg", v) => v }
        .filter(v => fields.exists(f => f.name == v && isDateField(f)))
        .orElse(fields.find(isDateField).map(_.name))

    /** setDtgField analog (RichSimpleFeatureType.setDtgField): naming a
      * missing or non-Date attribute is an IllegalArgumentException, not
      * a silent fallback (TemporalIndexCheckTest "getDTGFieldName"). */
    def withDtgField(name: String): Schema = {
      require(fields.exists(f => f.name == name && isDateField(f)),
        s"$name is not a Date attribute of $typeName")
      copy(userData = ("geomesa.index.dtg" -> name) +:
        userData.filterNot(_._1 == "geomesa.index.dtg"))
    }

    /** Secondary-indexed attributes, never including the default geometry
      * (SimpleFeatureTypes.getSecondaryIndexedAttributes). */
    def secondaryIndexed: Seq[String] =
      fields.filter(f => !(f.isGeometry && defaultGeometry.contains(f.name)) &&
        f.option("index").exists(v => v.equalsIgnoreCase("true") ||
          v.equalsIgnoreCase("join") || v.equalsIgnoreCase("full"))).map(_.name)

    def userDataMap: Map[String, String] = userData.toMap

    /** Attribute cardinality hints (`index=true:cardinality=high|low`,
      * SimpleFeatureTypes.OPT_CARDINALITY) — drives the strategy
      * decider's cost adjustment like the reference's
      * AttributeFilterStrategy.getCost. */
    def cardinalities: Map[String, String] =
      fields.flatMap(f => f.option("cardinality").map(f.name -> _)).toMap

    /** `geomesa.indices.enabled='z3,z2,attr'` -> the layouts to build. */
    def enabledIndices: Seq[String] =
      userDataMap.get("geomesa.indices.enabled").map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)

    def encode(includeUserData: Boolean = false): String = {
      val attrs = fields.map(_.toSpec).mkString(",")
      if (!includeUserData) attrs else {
        val prefixes = "geomesa" +: userDataMap.get("geomesa.user-data.prefix")
          .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
        val dtg = defaultDate.map(d => "geomesa.index.dtg" -> d).toSeq
        val kept = (dtg ++ userData).distinct.filter { case (k, _) =>
          prefixes.exists(p => k == p || k.startsWith(p + ".")) }
        if (kept.isEmpty) attrs else attrs + ";" + kept.map { case (k, v) => s"$k='$v'" }.mkString(",")
      }
    }
  }

  /** GeoTools reserved words that cannot be attribute names — they
    * collide with the CQL grammar (FeatureUtils.ReservedWords,
    * geomesa-utils/.../geotools/FeatureUtils.scala:26-134; the
    * published list in docs/user/datastores/reserved_words.rst).
    * Case-insensitive; `override.reserved.words='true'` user data
    * skips the check, like the reference's createSchema override. */
  val ReservedWords: Set[String] = Set(
    "AFTER", "AND", "BEFORE", "BEYOND", "CONTAINS", "CROSSES", "DISJOINT",
    "DOES-NOT-EXIST", "DURING", "DWITHIN", "EQUALS", "EXCLUDE", "EXISTS",
    "FALSE", "GEOMETRYCOLLECTION", "ID", "INCLUDE", "INTERSECTS", "IS",
    "LIKE", "LINESTRING", "LOCATION", "MULTILINESTRING", "MULTIPOINT",
    "MULTIPOLYGON", "NOT", "NULL", "OR", "OVERLAPS", "POINT", "POLYGON",
    "RELATE", "TOUCHES", "TRUE", "WITHIN")

  /** Attribute names of `s` that are reserved words
    * (FeatureUtils.sftReservedWords analog). */
  def reservedWords(s: Schema): Seq[String] =
    s.fields.map(_.name.toUpperCase(java.util.Locale.US)).filter(ReservedWords.contains)

  /** The createSchema-time check (GeoMesaDataStore rejects reserved
    * attribute names when a TABLE is created, NOT when a spec string is
    * parsed — SimpleFeatureTypes.createType accepts them, and its own
    * tests use `id:Integer`). Call from table-creation paths. */
  def validateReservedWords(s: Schema): Unit = {
    val overridden = s.userData.exists {
      case ("override.reserved.words", v) => v.equalsIgnoreCase("true"); case _ => false
    }
    if (!overridden) {
      val bad = reservedWords(s)
      require(bad.isEmpty,
        s"reserved words in attribute names: ${bad.mkString(", ")} — " +
          "set override.reserved.words='true' to skip this check")
    }
  }

  /** `createType("ns:name", "a:String,*geom:Point:srid=4326;k='v'")`. */
  def parse(name: String, spec: String): Schema = {
    val (ns, local) = splitName(name)
    val semi = indexOfTopLevel(spec, ';')
    val (attrPart, udPart) = if (semi < 0) (spec, "") else (spec.take(semi), spec.drop(semi + 1))
    val fields = splitTopLevel(attrPart, ',').filter(_.nonEmpty).map(parseField)
    require(fields.count(_.defaultGeom) <= 1, "multiple default geometries")
    Schema(local, ns, fields, parseUserData(udPart))
  }

  /** Namespace split — last ':', rejected when the local part is empty
    * (SimpleFeatureTypesTest "handle namespaces"/"invalid ones"). */
  private def splitName(name: String): (Option[String], String) = {
    val i = name.lastIndexOf(':')
    if (i <= 0 || i == name.length - 1) (None, name)
    else (Some(name.take(i)), name.drop(i + 1))
  }

  private def parseField(s: String): Field = {
    val defaultGeom = s.startsWith("*")
    val body = if (defaultGeom) s.drop(1) else s
    // name : Type : opt=v : opt=v — the Type may contain commas inside
    // brackets (Map[Double,String]) but never a colon.
    val parts = body.split(':')
    require(parts.length >= 2, s"invalid attribute spec '$s'")
    val name = parts(0).trim
    val typeName = canonicalType(parts(1).trim)
    require(!defaultGeom || geometryNames(typeName), s"default marker on non-geometry '$s'")
    val options = parts.drop(2).toSeq.map { o =>
      val i = o.indexOf('=')
      require(i > 0, s"invalid attribute option '$o' in '$s'")
      (o.take(i).trim, o.drop(i + 1).trim)
    }
    options.find(_._1 == "srid").foreach { case (_, v) =>
      require(v == "4326", s"Invalid SRID '$v'. Only 4326 is supported.") }
    Field(name, typeName, options, defaultGeom)
  }

  private def canonicalType(t: String): String = {
    if (t.startsWith("List[") || t.startsWith("Map[") || t == "List" || t == "Map" ||
        t == "list" || t == "map" || t.startsWith("java.util.")) {
      val bracket = t.indexOf('[')
      val (kind0, params) = if (bracket < 0) (t, "") else {
        require(t.endsWith("]") && t.indexOf(']') == t.length - 1,
          s"illegal parameterized type '$t'")
        (t.take(bracket), t.substring(bracket + 1, t.length - 1))
      }
      val kind = kind0.stripPrefix("java.util.") match {
        case "list" | "List" => "List"
        case "map" | "Map" => "Map"
        case other => throw new IllegalArgumentException(s"unknown type '$other'")
      }
      val args = if (params.isEmpty) Nil else splitTopLevel(params, ',')
      kind match {
        case "List" =>
          require(args.size <= 1, s"List takes one type parameter: '$t'")
          val item = args.headOption.map(simpleOnly).getOrElse("String")
          s"List[$item]"
        case "Map" =>
          require(args.isEmpty || args.size == 2, s"Map takes two type parameters: '$t'")
          val Seq(k, v) = if (args.isEmpty) Seq("String", "String") else args.map(simpleOnly)
          s"Map[$k,$v]"
      }
    } else if (geometryNames(t)) t
    else simpleOnly(t)
  }

  private def simpleOnly(t: String): String =
    simpleAliases.getOrElse(t.trim,
      throw new IllegalArgumentException(s"unknown type '$t'"))

  /** `k=v,k2='v with , and = inside'` — quotes guard separators. */
  private def parseUserData(s: String): Seq[(String, String)] =
    splitTopLevel(s, ',').filter(_.nonEmpty).map { kv =>
      val i = indexOfTopLevel(kv, '=')
      require(i > 0, s"invalid user-data entry '$kv'")
      val v = kv.drop(i + 1).trim
      val unquoted = if (v.length >= 2 && v.head == '\'' && v.last == '\'') v.substring(1, v.length - 1) else v
      (kv.take(i).trim, unquoted)
    }

  private def indexOfTopLevel(s: String, sep: Char): Int = {
    var depth = 0; var quoted = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') quoted = !quoted
      else if (!quoted && (c == '[' || c == '(')) depth += 1
      else if (!quoted && (c == ']' || c == ')')) depth -= 1
      else if (!quoted && depth == 0 && c == sep) return i
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    if (s.trim.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var rest = s
    var i = indexOfTopLevel(rest, sep)
    while (i >= 0) {
      out += rest.take(i).trim
      rest = rest.drop(i + 1)
      i = indexOfTopLevel(rest, sep)
    }
    out += rest.trim
    out.toSeq
  }

  /** Inverse direction: a Spark schema (e.g. `df.schema`) back to a spec
    * string, honoring `sft.*` metadata written by [[Field.toStructField]]
    * and falling back to the natural Spark-type mapping otherwise. */
  def fromSchema(typeName: String, schema: StructType): Schema = {
    val fields = schema.fields.toSeq.map { f =>
      val md = f.metadata
      val t =
        if (md.contains("sft.type")) md.getString("sft.type")
        else f.dataType match {
          case StringType => "String"
          case IntegerType => "Integer"
          case LongType => "Long"
          case DoubleType => "Double"
          case FloatType => "Float"
          case BooleanType => "Boolean"
          case TimestampType => "Date"
          case DateType => "Date"
          case BinaryType => "Bytes"
          case ArrayType(e, _) => s"List[${fromSparkSimple(e)}]"
          case MapType(k, v, _) => s"Map[${fromSparkSimple(k)},${fromSparkSimple(v)}]"
          case other => throw new IllegalArgumentException(s"cannot encode Spark type $other")
        }
      val opts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      if (geometryNames(t)) opts += ("srid" -> md.getLong("sft.srid").toString)
      val optKeys = md.json // Metadata has no key iteration API; parse its json
      // restore sft.opt.* options in a stable order
      val restored = "\"sft\\.opt\\.([^\"]+)\"".r.findAllMatchIn(optKeys).map(_.group(1)).toSeq.sorted
      restored.foreach(k => opts += (k -> md.getString(s"sft.opt.$k")))
      Field(f.name, t, opts.toSeq, md.contains("sft.default") && md.getBoolean("sft.default"))
    }
    val (ns, local) = splitName(typeName)
    Schema(local, ns, fields, Nil)
  }

  private def fromSparkSimple(dt: DataType): String = dt match {
    case StringType => "String"
    case IntegerType => "Integer"
    case LongType => "Long"
    case DoubleType => "Double"
    case FloatType => "Float"
    case BooleanType => "Boolean"
    case TimestampType | DateType => "Date"
    case BinaryType => "Bytes"
    case other => throw new IllegalArgumentException(s"cannot encode Spark type $other")
  }
}
