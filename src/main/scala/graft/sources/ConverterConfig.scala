package graft.sources

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Config-driven converter definitions — the surface analog of
 * geomesa-convert's config-defined converters (geomesa-convert/README
 * .md:1-5: a converter is DATA, loaded from config, not code). The
 * reference parses HOCON; this parses the JSON subset of HOCON (every
 * JSON document is valid HOCON) with Spark's bundled Jackson —
 * HOCON-only sugar (substitutions, includes, unquoted keys) is out of
 * scope and recorded in SURVEY §8. The parsed config compiles to the
 * same `Converters.Field` specs the programmatic API uses, so the
 * execution path (codegen column extraction) is identical.
 *
 * Config shape:
 * {{{
 * { "type": "delimited",            // delimited | fixed-width | json | xml | composite
 *   "delimiter": "|",               // delimited only
 *   "fields": [
 *     {"name": "id",  "col": 0, "type": "bigint"},
 *     {"name": "tag", "fixed": {"start": 0, "len": 5}},
 *     {"name": "k",   "json-path": "$.props.k"},
 *     {"name": "x",   "xpath": "/e/@x", "type": "double"},
 *     {"name": "t",   "transform": "concat(trim($1), '-', $2)"}
 *   ],
 *   "lon-field": "lon", "lat-field": "lat",   // optional geom derivation
 *   "caches": {                                // enrichment lookups
 *     "test": {"type": "simple", "data": {"1": {"name": "foo"}}}
 *   },
 *   "routes": [                                // composite only
 *     {"when-matches": "^\\{", "converter": { ...nested config... }}
 *   ] }
 * }}}
 *
 * Transforms may back-reference earlier fields by `$name` and call
 * `cacheLookup('cache', $key, 'field')` over the declared caches — the
 * reference's EnrichmentCacheTest shape.
 */
object ConverterConfig {

  final case class Parsed(
    typ: String,
    delimiter: String,
    fields: Seq[Converters.Field],
    lonField: Option[String],
    latField: Option[String],
    routes: Seq[(String, Parsed)],
    caches: Map[String, Transformers.SimpleCache] = Map.empty,
    sft: Option[graft.table.Sft.Schema] = None,
    featurePath: Option[String] = None,
    idField: Option[String] = None,
    csv: Option[Map[String, String]] = None,
    validation: Option[Validation] = None)

  /** The reference's `options.validators` + `options.validation-mode`
    * (convert/.../SimpleFeatureValidator + ValidatorTest): named row
    * validators, applied after conversion; `raise` fails the JOB on the
    * first invalid row (raise-errors), otherwise rows are filtered
    * (skip-bad-records). */
  final case class Validation(validators: Seq[String], raise: Boolean,
                              zPeriod: graft.cells.BinnedTime.Period)

  private val mapper = new ObjectMapper()

  /**
   * Parse a converter config. JSON parses as-is; anything Jackson
   * rejects re-parses through the from-scratch [[Hocon]] subset parser
   * (every JSON document is valid HOCON, so reference-doc configs —
   * unquoted keys, `=`, comments, newline separators — load VERBATIM).
   */
  def parse(config: String): Parsed = parseNode(readAny(config))

  private def readAny(config: String): JsonNode = {
    val viaJson =
      try Option(mapper.readTree(config)).filter(_.isObject)
      catch { case _: Exception => None }
    viaJson.getOrElse(Hocon.parse(config))
  }

  /**
   * Translate the reference's own config vocabulary onto this parser's
   * canonical keys, so configs from geomesa-convert docs work unedited:
   * type aliases (`delimited-text`, `composite-converter`), the
   * converter-relative `path` field key (JsonPath for json configs,
   * XPath for xml), and `json-type` (output type when the field has no
   * transform; INPUT documentation — dropped — when it does, since the
   * transform decides the output, matching the reference semantics).
   */
  private def normalize(n: JsonNode): JsonNode = n match {
    case o0: com.fasterxml.jackson.databind.node.ObjectNode =>
      val o = o0.deepCopy()
      Option(o.get("type")).map(_.asText) match {
        case Some("delimited-text") => o.put("type", "delimited")
        case Some("composite-converter") => o.put("type", "composite")
        case _ =>
      }
      val typ = Option(o.get("type")).map(_.asText)
      Option(o.get("fields")).foreach { fs =>
        fs.elements().asScala.foreach {
          case fo: com.fasterxml.jackson.databind.node.ObjectNode =>
            if (fo.has("path") && !fo.has("json-path") && !fo.has("xpath")) {
              val key = if (typ.contains("xml")) "xpath" else "json-path"
              fo.set[JsonNode](key, fo.remove("path"))
            }
            if (fo.has("json-type")) {
              val jt = fo.remove("json-type").asText
              if (!fo.has("transform") || jt == "geometry")
                fo.put("type", if (jt == "integer") "int" else jt)
            }
          case _ =>
        }
      }
      o
    case other => other
  }

  private def parseNode(n0: JsonNode): Parsed = {
    val n = normalize(n0)
    val typ = Option(n.get("type")).map(_.asText).getOrElse(
      throw new IllegalArgumentException("converter config needs a 'type'"))
    require(Set("delimited", "fixed-width", "json", "xml", "composite")(typ),
      s"unknown converter type '$typ'")
    val delimiter = Option(n.get("delimiter")).map(_.asText).getOrElse(",")
    val fields = Option(n.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Nil).map { f =>
      val name = Option(f.get("name")).map(_.asText).getOrElse(
        throw new IllegalArgumentException("field needs a 'name'"))
      // transforms keep their computed type unless 'type' is explicit
      val declaredType = Option(f.get("type")).map(_.asText)
      val castTo =
        if (declaredType.contains("geometry")) "" // geometry fields emit WKB directly
        else declaredType.getOrElse(if (f.has("transform")) "" else "string")
      val spec: Converters.Spec =
        // json-type = "geometry": the path value is a GeoJSON geometry
        // object (or WKT string), parsed to WKB in-scan
        if (declaredType.contains("geometry") && f.has("json-path") && !f.has("transform"))
          Converters.GeoJsonGeom(f.get("json-path").asText)
        else if (f.has("col")) Converters.Col(f.get("col").asInt)
        else if (f.has("fixed") && f.has("transform")) Converters.FixedWidthTransform(
          f.get("fixed").get("start").asInt, f.get("fixed").get("len").asInt,
          f.get("transform").asText)
        else if (f.has("fixed")) Converters.FixedWidth(
          f.get("fixed").get("start").asInt, f.get("fixed").get("len").asInt)
        // json-path + transform on one field: $0 binds to the extracted
        // value (the reference's `path = ..., transform = "fn($0)"` form)
        else if (f.has("json-path") && f.has("transform"))
          Converters.PathTransform(f.get("json-path").asText, f.get("transform").asText)
        else if (f.has("root-path") && f.has("transform"))
          Converters.PathTransform(f.get("root-path").asText, f.get("transform").asText,
            fromRoot = true)
        else if (f.has("json-path")) Converters.JsonPath(f.get("json-path").asText)
        else if (f.has("root-path")) Converters.RootJsonPath(f.get("root-path").asText)
        else if (f.has("xpath") && f.has("transform"))
          Converters.XPathTransform(f.get("xpath").asText, f.get("transform").asText)
        else if (f.has("xpath")) Converters.XPath(f.get("xpath").asText)
        else if (f.has("transform")) Converters.Transform(f.get("transform").asText)
        else throw new IllegalArgumentException(
          s"field '$name' needs one of col | fixed | json-path | root-path | xpath | transform")
      Converters.Field(name, spec, castTo)
    }
    val routes = Option(n.get("routes")).map(_.elements().asScala.toSeq).getOrElse(Nil).map { r =>
      val re = Option(r.get("when-matches")).map(_.asText).getOrElse(
        throw new IllegalArgumentException("composite route needs 'when-matches'"))
      val sub = Option(r.get("converter")).map(parseNode).getOrElse(
        throw new IllegalArgumentException("composite route needs a 'converter'"))
      require(sub.typ != "composite", "composite routes cannot nest another composite")
      require(sub.lonField.isEmpty && sub.latField.isEmpty,
        "put 'lon-field'/'lat-field' on the top-level composite, not on a route")
      (re, sub)
    }
    if (typ == "composite") require(routes.nonEmpty, "composite converter needs 'routes'")
    else require(fields.nonEmpty, s"converter type '$typ' needs 'fields'")
    // enrichment caches (the reference's `caches` converter section,
    // EnrichmentCacheTest): only inline "simple" data — external KV
    // backends map to the broadcast-join path (Converters.enrich)
    val caches = Option(n.get("caches")).map { cs =>
      cs.properties().asScala.map { e =>
        val cName = e.getKey
        val c = e.getValue
        val cTyp = Option(c.get("type")).map(_.asText).getOrElse("simple")
        require(cTyp == "simple",
          s"cache '$cName': only 'simple' inline caches are supported " +
            "(use Converters.enrich for external lookup tables)")
        val data = Option(c.get("data")).map { d =>
          d.properties().asScala.map { kv =>
            kv.getKey -> kv.getValue.properties().asScala
              .map(f => f.getKey -> f.getValue.asText).toMap
          }.toMap
        }.getOrElse(Map.empty[String, Map[String, String]])
        cName -> Transformers.SimpleCache(data)
      }.toMap
    }.getOrElse(Map.empty[String, Transformers.SimpleCache])
    // paired schema — the reference's converters always carry an sft
    // (SimpleFeatureConverter.createConverter(sft, config)); declared as
    // the same spec-string grammar, it types/orders the output below
    val sft = Option(n.get("sft")).map { s =>
      val name = Option(n.get("type-name")).map(_.asText).getOrElse("converted")
      graft.table.Sft.parse(name, s.asText)
    }
    // feature-path (the reference's json converter key): one document
    // explodes into one record per matched array element; `path` fields
    // are then element-relative and `root-path` fields read the document
    val featurePath = Option(n.get("feature-path")).map(_.asText)
    featurePath.foreach(_ => require(typ == "json" || typ == "xml",
      "'feature-path' applies to json and xml converters"))
    // id-field (the reference's feature-ID derivation, e.g. "$id" or
    // "md5(string2bytes($0))"): a transform expression over the record
    // and named fields, materialized as a `fid` string column
    val idField = Option(n.get("id-field")).map(_.asText)
    // RFC4180-aware tokenization — the reference's `format` key
    // (DelimitedTextConverter.scala:37-46: CSV/TSV/QUOTED over
    // commons-csv) plus explicit `quote`/`escape` overrides. Without any
    // of these, tokenization stays a plain split on the delimiter.
    val fmt = Option(n.get("format")).map(_.asText.toUpperCase)
    val quote = Option(n.get("quote")).map(_.asText)
    val escape = Option(n.get("escape")).map(_.asText)
    quote.foreach(q => require(q.length == 1, s"quote must be a single char: '$q'"))
    escape.foreach(e => require(e.length == 1, s"escape must be a single char: '$e'"))
    // escape defaults to the quote char: RFC4180 (and commons-csv
    // DEFAULT) escape a quote by doubling it — Spark's univocity default
    // of backslash would leave "say ""hi""" unparsed
    def opts(q: String, extra: Map[String, String] = Map.empty) =
      extra ++ Map("quote" -> q, "escape" -> escape.getOrElse(q))
    val csvOpts: Option[Map[String, String]] = fmt match {
      case Some("CSV" | "DEFAULT" | "RFC4180" | "QUOTED" | "EXCEL") =>
        Some(opts(quote.getOrElse("\"")))
      case Some("TDF" | "TSV" | "TAB") =>
        Some(opts(quote.getOrElse("\""), Map("sep" -> "\t")))
      case Some(other) => throw new IllegalArgumentException(s"unknown delimited format '$other'")
      case None =>
        if (quote.isEmpty && escape.isEmpty) None
        else Some(opts(quote.getOrElse("\"")))
    }
    csvOpts.foreach(_ => require(typ == "delimited", "'format'/'quote' are delimited-only"))
    // options.validators / options.validation-mode (ValidatorTest):
    // unknown names and modes are config errors, not silent no-ops
    val validation = Option(n.get("options")).map { o =>
      val names = Option(o.get("validators")).map(_.elements().asScala.map(_.asText).toSeq)
        .getOrElse(Seq.empty)
      names.foreach(v => require(Set("has-geo", "has-dtg", "z-index")(v),
        s"unknown validator '$v' (expected has-geo | has-dtg | z-index)"))
      val mode = Option(o.get("validation-mode")).map(_.asText).getOrElse("skip-bad-records")
      require(Set("skip-bad-records", "raise-errors")(mode),
        s"unknown validation-mode '$mode' (expected skip-bad-records | raise-errors)")
      val period = graft.cells.BinnedTime.period(
        Option(o.get("z-index-period")).map(_.asText).getOrElse("week"))
      Validation(names, mode == "raise-errors", period)
    }.filter(_.validators.nonEmpty)
    Parsed(typ, delimiter,
      fields,
      Option(n.get("lon-field")).map(_.asText),
      Option(n.get("lat-field")).map(_.asText),
      routes,
      caches,
      sft,
      featurePath,
      idField,
      csvOpts,
      validation)
  }

  /** Apply a parsed config to a one-string-column DataFrame. */
  def apply(df: DataFrame, lineCol: String, cfg: Parsed): DataFrame = {
    // id-field compiles as one more transform field named `fid`,
    // evaluated LAST so it may back-reference every declared field; it
    // is exempt from the all-null parse-error skip (a uuid()/md5 fid is
    // never null and would otherwise keep unparseable rows alive)
    def withFid(fields: Seq[Converters.Field], idField: Option[String]): Seq[Converters.Field] =
      idField.map(e => fields :+ Converters.Field("fid", Converters.Transform(e), "string"))
        .getOrElse(fields)
    val converted = cfg.typ match {
      case "composite" =>
        // caches scope per route: the route's own declarations shadow the
        // top-level ones, and routes never see each other's caches. A
        // route is a full converter: its csv/feature-path/id-field apply;
        // validators are top-level only (routes union into one schema)
        cfg.routes.foreach { case (_, sub) =>
          require(sub.validation.isEmpty,
            "declare 'options.validators' on the top-level composite, not on a route")
        }
        require(cfg.routes.map(_._2.idField.orElse(cfg.idField).isDefined).distinct.size <= 1,
          "either every composite route derives an id-field or none does " +
            "(routes union into one schema)")
        val rs = cfg.routes.map { case (re, sub) =>
          val subId = sub.idField.orElse(cfg.idField)
          Converters.Route((line: Column) => line.rlike(re),
            withFid(sub.fields, subId), sub.delimiter,
            cfg.caches ++ sub.caches,
            featurePath = sub.featurePath, csv = sub.csv,
            xmlFeaturePath = sub.typ == "xml",
            skipExempt = subId.map(_ => "fid").toSet)
        }
        Converters.composite(df, lineCol, rs, cfg.lonField, cfg.latField)
      case _ =>
        Converters.convert(df, lineCol, withFid(cfg.fields, cfg.idField), cfg.delimiter,
          cfg.lonField, cfg.latField, cfg.caches, cfg.featurePath, cfg.csv,
          xmlFeaturePath = cfg.typ == "xml",
          skipExempt = cfg.idField.map(_ => "fid").toSet)
    }
    // the sft declares the feature ATTRIBUTES; a derived fid rides along
    val typed = cfg.sft.map(coerceToSft(converted, _, keep = cfg.idField.map(_ => "fid").toSeq))
      .getOrElse(converted)
    cfg.validation.map(validate(typed, _, cfg.sft)).getOrElse(typed)
  }

  /** Apply the configured validators. Column resolution: geometry = the
    * sft's default geometry when declared, else a column named `geom`;
    * date = the sft's default date, else a column named `dtg`. skip mode
    * filters invalid rows; raise mode fails the job at the FIRST invalid
    * row via assert_true inside the same scan (no extra pass). */
  private def validate(df: DataFrame, v: Validation,
                       sft: Option[graft.table.Sft.Schema]): DataFrame = {
    import graft.cells.BinnedTime
    def resolve(preferred: Option[String], fallback: String, what: String): String = {
      val name = preferred.getOrElse(fallback)
      require(df.columns.contains(name),
        s"validator needs a '$name' column ($what) — declare it or drop the validator")
      name
    }
    lazy val geomCol = resolve(sft.flatMap(_.defaultGeometry), "geom", "geometry")
    lazy val dtgCol = resolve(sft.flatMap(_.defaultDate), "dtg", "date")
    val world = lit(graft.geom.GeomOps.toWkb(graft.geom.GeomOps.worldPolygon))
    val checks: Seq[(String, Column)] = v.validators.flatMap {
      case "has-geo" => Seq("has-geo: geometry is null" -> col(geomCol).isNotNull)
      case "has-dtg" => Seq("has-dtg: date is null" -> col(dtgCol).isNotNull)
      case "z-index" =>
        // the reference's z-index validator: the date must be Z3-binnable
        // (epoch <= dtg < Short.MaxValue+1 periods) and the geometry must
        // lie in the index's lon/lat domain
        // try_cast: a malformed date must FAIL THE CHECK, not the job
        // (skip mode filters it; raise mode reports it) — a plain cast
        // under ANSI would abort the job before validation ran
        val ts = col(dtgCol).try_cast("timestamp")
        Seq(
          s"z-index: date outside binnable range" ->
            (ts.isNotNull && unix_millis(ts) >= lit(BinnedTime.MinMillis) &&
              unix_millis(ts) < lit(BinnedTime.maxMillis(v.zPeriod))),
          "z-index: geometry outside lon/lat bounds" ->
            (col(geomCol).isNotNull && graft.functions.StFunctions.stWithin(col(geomCol), world)))
    }
    if (!v.raise) df.where(checks.map(_._2).reduce(_ && _))
    else df.where(checks.map { case (msg, c) =>
      coalesce(assert_true(c, lit(s"validation failed ($msg)")).cast("boolean"), lit(true))
    }.reduce(_ && _))
  }

  /** Align the converted frame to the declared sft: columns in sft order
    * with sft types (try_cast semantics — malformed values become null,
    * like the reference's ErrorMode.SkipBadRecords), geometry columns
    * from WKT text when needed, unmapped attributes as typed nulls, and
    * the `sft.*` metadata stamped on each column so `Sft.fromSchema`
    * round-trips the declaration off any downstream DataFrame. */
  // lenient WKT parse: malformed text -> null geometry, matching the
  // try_cast semantics every non-geometry field gets (the reference's
  // ErrorMode.SkipBadRecords nulls the field rather than failing the job)
  private val tryGeomFromWkt = udf(graft.geom.GeomOps.wktToWkbOrNull _)

  private def coerceToSft(df: DataFrame, sft: graft.table.Sft.Schema,
                          keep: Seq[String] = Nil): DataFrame = {
    val out = sft.fields.map { f =>
      val target = f.toStructField
      val coerced =
        if (!df.columns.contains(f.name)) lit(null).cast(target.dataType)
        else {
          val cur = df.schema(f.name).dataType
          val c = col(f.name)
          if (cur == target.dataType) c
          else if (f.isGeometry) tryGeomFromWkt(c) // null on bad WKT, like try_cast
          else c.try_cast(target.dataType)
        }
      coerced.as(f.name, target.metadata)
    }
    val extras = keep.filter(k => df.columns.contains(k) && !sft.fields.exists(_.name == k))
      .map(col)
    df.select(out ++ extras: _*)
  }

  /** Config string + text path -> converted DataFrame (the CLI shape). */
  def fromText(spark: SparkSession, path: String, configJson: String): DataFrame =
    apply(spark.read.text(path), "value", parse(configJson))

  /** Streaming variant over readStream.text. */
  def fromTextStream(spark: SparkSession, path: String, configJson: String): DataFrame =
    apply(spark.readStream.text(path), "value", parse(configJson))
}
