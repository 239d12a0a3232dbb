package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Config-driven converter framework — the Spark-native re-expression of
 * the reference's geomesa-convert modules (delimited-text, fixed-width,
 * xml, json, composite; /root/reference/geomesa-convert-* dirs). The
 * reference interprets a HOCON config per record on a custom iterator;
 * here a converter IS a function from a raw-line DataFrame to a typed
 * DataFrame, built from the same declarative field specs — so parsing
 * runs inside Spark's scan + codegen machinery and scales like any
 * other projection.
 *
 * Field extractors:
 *  - delimited: split + element_at (pure Columns, codegen)
 *  - fixed-width: substring specs (pure Columns)
 *  - json: get_json_object paths (built-in)
 *  - xml: XPath over each record via the JDK's javax.xml (UDF — the JDK
 *    parser is the only XML machinery on a vanilla Spark classpath)
 *  - composite: per-line routing predicate -> first matching converter
 *    (the reference's composite-converter dispatch)
 *
 * Every converter yields the user schema plus optional derived
 * `geom` (WKB from lon/lat fields) — the reference's transform step.
 */
object Converters {

  /** One output field: `name`, extraction `spec`, and the SQL cast type. */
  final case class Field(name: String, spec: Spec, castTo: String = "string")
  sealed trait Spec
  /** delimited column index (0-based, after split on the delimiter) */
  final case class Col(i: Int) extends Spec
  /** fixed-width slice [start, start+len) (0-based chars) */
  final case class FixedWidth(start: Int, len: Int) extends Spec
  /** fixed-width slice piped through a transform; $0 binds to the slice
    * (the reference's FixedWidthField start/width + transform) */
  final case class FixedWidthTransform(start: Int, len: Int, expr: String) extends Spec
  /** JSON path, e.g. "$.props.k" — relative to the current record (the
    * exploded element when a feature-path is set) */
  final case class JsonPath(path: String) extends Spec
  /** JSON path against the WHOLE input document when a feature-path
    * explodes it into per-feature records — the reference's `root-path`
    * fields (JsonSimpleFeatureConverter.scala:151-152: with a
    * feature-path, `path` is element-relative and `root-path` reads the
    * global context). Without a feature-path it equals [[JsonPath]]. */
  final case class RootJsonPath(path: String) extends Spec
  /** XPath over the record's XML, e.g. "/event/@id" or "/event/lon/text()".
    * Under an XML feature-path, ABSOLUTE paths (leading '/') evaluate
    * against the whole input document and relative paths against the
    * exploded feature node — the reference's rule (XMLConverterTest:66-73
    * "paths can be any xpath - relative to the feature-path, or absolute"). */
  final case class XPath(path: String) extends Spec
  /** XPath + transform on ONE field: `$0` binds to the extracted value. */
  final case class XPathTransform(path: String, expr: String) extends Spec
  /** A transform-language expression (the reference's `transform = "..."`
    * strings; sources/Transformers): `$0` is the raw record, `$N` the
    * N-th delimited token — e.g. "concat(trim($1), '-', $2::int)". */
  final case class Transform(expr: String) extends Spec
  /** JSON path + transform on ONE field — the reference's combined form
    * (`path = "$.id", transform = "toString($0)"`): `$0` binds to the
    * EXTRACTED path value, not the raw record. */
  final case class PathTransform(path: String, expr: String,
                                 fromRoot: Boolean = false) extends Spec
  /** A geometry embedded in the JSON record — the reference's
    * `json-type = "geometry"` fields (JsonConverterTest "parse geojson
    * geometries"): the value at the path is a GeoJSON geometry object
    * (or a WKT string); parses to WKB, null on malformed input like
    * every other field (ErrorMode.SkipBadRecords). */
  final case class GeoJsonGeom(path: String) extends Spec

  private val geomJsonUdf = udf { (s: String) =>
    if (s == null) null
    else if (s.trim.startsWith("{")) {
      try graft.geom.GeomOps.toWkb(graft.geom.GeoJson.read(s))
      catch { case _: Exception => null }
    } else graft.geom.GeomOps.wktToWkbOrNull(s)
  }

  // parser/xpath/transformer machinery is NOT thread-safe but IS
  // reusable — per-task thread locals instead of a factory per ROW
  // (building DocumentBuilderFactory per record was ~30x slower; the
  // reference likewise caches its parser per converter instance)
  @transient private lazy val docBuilder =
    new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
      override def initialValue(): javax.xml.parsers.DocumentBuilder =
        javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
    }
  @transient private lazy val xpathEval =
    new ThreadLocal[javax.xml.xpath.XPath] {
      override def initialValue(): javax.xml.xpath.XPath =
        javax.xml.xpath.XPathFactory.newInstance().newXPath()
    }
  // XPath.evaluate(String, ...) COMPILES the expression on every call —
  // the converter's paths are a fixed small set, so compile each once
  // per thread (XPathExpression is not thread-safe but is reusable)
  @transient private lazy val xpathCompiled =
    new ThreadLocal[scala.collection.mutable.HashMap[String, javax.xml.xpath.XPathExpression]] {
      override def initialValue() = scala.collection.mutable.HashMap.empty
    }
  private def compiledXPath(p: String): javax.xml.xpath.XPathExpression = {
    val cache = xpathCompiled.get()
    // bounded: a converter's path set is small; an unbounded stream of
    // distinct paths (dynamic configs on a long-lived executor) must
    // not grow the thread-local forever
    if (cache.size >= 256 && !cache.contains(p)) xpathEval.get().compile(p)
    else cache.getOrElseUpdate(p, xpathEval.get().compile(p))
  }
  @transient private lazy val xmlTransformer =
    new ThreadLocal[javax.xml.transform.Transformer] {
      // output properties are (re)set per call — reset() clears them
      override def initialValue(): javax.xml.transform.Transformer =
        javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    }

  private def parseXml(xml: String): org.w3c.dom.Document = {
    val b = docBuilder.get()
    b.reset()
    b.parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
  }

  /** Evaluate ALL of a record's XPaths against ONE parsed DOM — the
    * reference parses each record once and runs every field's xpath over
    * it; a per-field parse would cost k DOM parses per row at scale.
    * Context = the root ELEMENT, so relative paths resolve against the
    * (possibly exploded feature) node; absolute paths ignore context. */
  // .asNondeterministic() below is an OPTIMIZER FENCE, not a semantic
  // claim: CollapseProject inlines deterministic intermediate columns
  // into every consumer, turning the shared once-per-record evaluation
  // into one DOM parse PER FIELD (3-4x the work; ScalaUDF calls are not
  // recovered by codegen subexpression elimination). Non-deterministic
  // expressions are never duplicated, so the shared array materializes
  // exactly once per record. Tradeoff: predicates no longer push below
  // the projection, so filters on the converter's non-XML fields run
  // after the parse — the right side of the trade for parse-dominant
  // XML workloads (the reference's converter parses every record too).
  private val xpathsUdf = udf { (xml: String, paths: Seq[String]) =>
    if (xml == null) null
    else {
      try {
        val doc = parseXml(xml)
        val root = doc.getDocumentElement
        paths.map { p =>
          try {
            val s = compiledXPath(p).evaluate(root)
            if (s == null || s.isEmpty) null else s
          } catch { case _: Exception => null }
        }
      } catch { case _: Exception => paths.map(_ => null) }
    }
  }.asNondeterministic()

  // ---- StAX fast path (VERDICT r4 #3) --------------------------------
  //
  // The per-row DOM + compiled-XPath design is correct but its constant
  // dominates the bench (q_convert_xml). The driver-config subset —
  // simple child/attribute steps, no namespaces, no predicates, no
  // descendant axes — evaluates in ONE forward pull-parse per record:
  // every field captures during the same scan, first-match-in-document-
  // order exactly like XPath's STRING conversion. Anything outside the
  // subset (a ':', '[', '//', '..') keeps the DOM path.

  /** A simple XPath: optional leading '/', element name steps, and an
    * optional trailing `text()` or `@attr`. */
  private[sources] final case class SimplePath(absolute: Boolean, elems: Seq[String],
                                               attr: Option[String], textOnly: Boolean)

  private val SimpleName = "[A-Za-z_][A-Za-z0-9_.\\-]*"

  private[sources] def parseSimplePath(p: String): Option[SimplePath] = {
    if (p.contains("//") || p.contains("[") || p.contains(":") ||
        p.contains("..") || p.contains("*")) return None
    val absolute = p.startsWith("/")
    val body = if (absolute) p.drop(1) else p
    if (body.isEmpty || body.endsWith("/")) return None
    var segs = body.split('/').toSeq
    var attr: Option[String] = None
    var text = false
    segs.last match {
      case "text()" => text = true; segs = segs.dropRight(1)
      case a if a.startsWith("@") => attr = Some(a.drop(1)); segs = segs.dropRight(1)
      case _ =>
    }
    if (attr.exists(a => !a.matches(SimpleName))) return None
    if (!segs.forall(_.matches(SimpleName))) return None
    if (absolute && segs.isEmpty) return None // "/text()" etc: not worth the subtlety
    Some(SimplePath(absolute, segs, attr, text))
  }

  @transient private lazy val staxFactory =
    new ThreadLocal[javax.xml.stream.XMLInputFactory] {
      override def initialValue(): javax.xml.stream.XMLInputFactory = {
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        // coalescing makes each text node ONE characters event (CDATA
        // included), so "first text node" is well-defined below; DTD
        // support off like the DOM path's default hardening posture
        f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
        // namespace-UNAWARE, matching the DOM path's DocumentBuilder
        // default: qualified names compare as the literal tokens
        f.setProperty(javax.xml.stream.XMLInputFactory.IS_NAMESPACE_AWARE, java.lang.Boolean.FALSE)
        f
      }
    }

  /** One forward scan extracting every simple path at once. Returns one
    * slot per path: the attribute value, the first matching element's
    * string value (all descendant text) or first text node — empty and
    * missing both null, exactly the XPath STRING conversion the DOM
    * path applies. Malformed XML -> all nulls (the DOM path's whole-
    * document parse failure). */
  private def staxExtract(xml: String, specs: Seq[SimplePath]): Seq[String] = {
    val n = specs.size
    val results = new Array[String](n)
    val satisfied = new Array[Boolean](n)
    val capturing = new Array[Boolean](n)
    val captureDepth = new Array[Int](n)
    val buffers = Array.fill(n)(null: java.lang.StringBuilder)
    // target element paths resolve against the ROOT element name (the
    // XPath context node): relative paths prepend it, absolute paths
    // must begin with it
    val targets = new Array[Seq[String]](n)
    val reader = staxFactory.get().createXMLStreamReader(new java.io.StringReader(xml))
    try {
      val stack = new scala.collection.mutable.ArrayBuffer[String](8)
      var rootSeen = false
      while (reader.hasNext) {
        reader.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val name = reader.getLocalName
            stack += name
            if (!rootSeen) {
              rootSeen = true
              var i = 0
              while (i < n) {
                val s = specs(i)
                targets(i) =
                  if (s.absolute) { if (s.elems.head == name) s.elems else null }
                  else name +: s.elems
                i += 1
              }
            }
            var i = 0
            while (i < n) {
              if (!satisfied(i) && !capturing(i) && targets(i) != null &&
                  stack.length == targets(i).length && stackMatches(stack, targets(i))) {
                specs(i).attr match {
                  case Some(a) =>
                    // XPath's node-set holds ATTRIBUTE nodes: the first
                    // matching element WITHOUT the attribute contributes
                    // nothing, so a later sibling that has it still wins
                    // (review r5 #2) — present-but-empty IS a node and
                    // does satisfy (string value "", nulled at the end)
                    val v = reader.getAttributeValue(null, a)
                    if (v != null) {
                      results(i) = v
                      satisfied(i) = true
                    }
                  case None =>
                    capturing(i) = true
                    captureDepth(i) = stack.length
                    buffers(i) = new java.lang.StringBuilder()
                }
              }
              i += 1
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            var i = 0
            while (i < n) {
              if (capturing(i) && !satisfied(i)) {
                if (specs(i).textOnly) {
                  // first text NODE = the first characters event that is
                  // a DIRECT child of the matched element
                  if (stack.length == captureDepth(i)) {
                    results(i) = reader.getText
                    satisfied(i) = true
                    capturing(i) = false
                  }
                } else buffers(i).append(reader.getText)
              }
              i += 1
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            stack.remove(stack.length - 1)
            var i = 0
            while (i < n) {
              if (capturing(i) && stack.length < captureDepth(i)) {
                capturing(i) = false
                if (!satisfied(i)) {
                  if (specs(i).textOnly) {
                    // no direct text node in this element: its
                    // contribution to the XPath node-set is EMPTY — a
                    // later matching sibling may still hold the first
                    // text node, so stay unsatisfied (review r5 #3)
                  } else {
                    // an element node DID match (even if empty): XPath
                    // takes the first element's string value
                    satisfied(i) = true
                    results(i) = buffers(i).toString
                  }
                }
              }
              i += 1
            }
          case _ =>
        }
      }
      results.toSeq.map(r => if (r == null || r.isEmpty) null else r)
    } finally reader.close()
  }

  private def stackMatches(stack: scala.collection.mutable.ArrayBuffer[String],
                           target: Seq[String]): Boolean = {
    var i = 0
    while (i < target.length) {
      if (stack(i) != target(i)) return false
      i += 1
    }
    true
  }

  /** The shared per-record XML extractor for a path group: the StAX
    * single pass when EVERY path is simple, the DOM + compiled-XPath
    * evaluator otherwise. Both are wrapped `.asNondeterministic()` for
    * the same optimizer-fence reason as [[xpathsUdf]]. */
  private def xmlExtractor(paths: Seq[String]): Column => Column = {
    val parsed = paths.map(parseSimplePath)
    if (parsed.forall(_.isDefined)) {
      val specs = parsed.map(_.get)
      val u = udf { (xml: String) =>
        if (xml == null) null
        else {
          try staxExtract(xml, specs)
          catch { case _: Exception => specs.map(_ => null: String) }
        }
      }.asNondeterministic()
      (c: Column) => u(c)
    } else (c: Column) => xpathsUdf(c, typedLit(paths))
  }

  /** XML feature-path: evaluate the path as a NODESET and serialize each
    * matched node to its own standalone XML record (the reference's
    * one-document-to-N-features XML mode). */
  private val xmlNodesUdf = udf { (xml: String, path: String) =>
    if (xml == null) null
    else {
      try {
        val doc = parseXml(xml)
        val nodes = compiledXPath(path).evaluate(doc.getDocumentElement,
          javax.xml.xpath.XPathConstants.NODESET)
          .asInstanceOf[org.w3c.dom.NodeList]
        val tf = xmlTransformer.get()
        tf.reset()
        tf.setOutputProperty(javax.xml.transform.OutputKeys.OMIT_XML_DECLARATION, "yes")
        (0 until nodes.getLength).map { i =>
          val out = new java.io.StringWriter()
          tf.transform(new javax.xml.transform.dom.DOMSource(nodes.item(i)),
            new javax.xml.transform.stream.StreamResult(out))
          out.toString
        }
      } catch { case _: Exception => Seq.empty[String] }
    }
  }

  private def extract(line: Column, root: Column, tokens: Column, f: Field, delimiter: String,
                      named: Map[String, Column] = Map.empty,
                      caches: Map[String, Transformers.SimpleCache] = Map.empty,
                      xpaths: Map[String, Column] = Map.empty): Column = {
    // $0 / the raw record = line; $N / Col(i) read the shared token array
    def tokenOf(n: Int): Column = if (n == 0) line else try_element_at(tokens, lit(n))
    val raw = f.spec match {
      // try_element_at: a line with too few fields is a parse error to
      // skip (null), not an ANSI INVALID_ARRAY_INDEX job failure
      case Col(i) => tokenOf(i + 1)
      case FixedWidth(start, len) => trim(substring(line, start + 1, len))
      case FixedWidthTransform(start, len, e) =>
        Transformers.compile(e,
          { case 0 => trim(substring(line, start + 1, len)); case n => tokenOf(n) }, named, caches)
      case JsonPath(p) => get_json_object(line, p)
      case RootJsonPath(p) => get_json_object(root, p)
      // xpath values come from the shared once-per-record evaluation
      case XPath(p) => xpaths(p)
      case XPathTransform(p, e) =>
        Transformers.compile(e, { case 0 => xpaths(p); case n => tokenOf(n) }, named, caches)
      case Transform(e) => Transformers.compile(e, tokenOf, named, caches)
      case PathTransform(p, e, fromRoot) =>
        val v = get_json_object(if (fromRoot) root else line, p)
        Transformers.compile(e, { case 0 => v; case n => tokenOf(n) }, named, caches)
      case GeoJsonGeom(p) => geomJsonUdf(get_json_object(line, p))
    }
    // try_cast: a malformed value under ANSI mode is a parse error to
    // skip (null), not a CAST_INVALID_INPUT job failure. An empty castTo
    // keeps the extractor's own type (transforms carry theirs).
    if (f.castTo.isEmpty) raw else raw.try_cast(f.castTo)
  }

  /**
   * Apply a converter to a DataFrame with a single string column
   * `lineCol`. Rows where every field is null are dropped (the
   * reference's parse-error skip mode); add lon/lat field names to also
   * derive a WKB `geom` column.
   */
  def convert(df: DataFrame, lineCol: String, fields: Seq[Field],
              delimiter: String = ",",
              lonField: Option[String] = None, latField: Option[String] = None,
              caches: Map[String, Transformers.SimpleCache] = Map.empty,
              featurePath: Option[String] = None,
              csv: Option[Map[String, String]] = None,
              xmlFeaturePath: Boolean = false,
              skipExempt: Set[String] = Set.empty): DataFrame = {
    // fields compile in order and later transforms may back-reference
    // earlier ones by `$name` (the reference's evaluation order —
    // EnrichmentCacheTest's `point($lon, $lat)`). Each field becomes its
    // own projection referencing the PREVIOUS field's column, so a
    // back-reference reuses the computed VALUE (matters for
    // non-deterministic transforms like uuid(); Catalyst's
    // CollapseProject still folds the deterministic chain into one
    // projection). The raw line is kept under a private name so a field
    // may legally be called `lineCol` without breaking later `$N` refs.
    val line = "__graft_line"
    val root = "__graft_root"
    var cur = df.select(col(lineCol).as(line))
    // feature-path (json only): one document yields one record per array
    // element — the reference's JsonSimpleFeatureConverter `feature-path`
    // (JsonConverterTest "parse multiple features out of a single
    // document"). Spark-native: get_json_object extracts the array,
    // from_json(array<string>) re-exposes each element as its own JSON
    // text, explode makes it the per-feature record (a whole-stage-
    // codegen Generate — no UDF). A document without the path yields no
    // rows (from_json(null) explodes to nothing), the parse-error skip.
    featurePath.foreach { fp =>
      val elems: Column = if (xmlFeaturePath) {
        // XML: the path is any XPath evaluated as a NODESET; each matched
        // node serializes to its own standalone record
        xmlNodesUdf(col(line), lit(fp))
      } else {
        require(fp.endsWith("[*]"),
          s"feature-path must select array elements, ending in [*]: '$fp'")
        val base = fp.stripSuffix("[*]").stripSuffix(".") match {
          case "$" | "" => "$"
          case b => b
        }
        from_json(get_json_object(col(line), base),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
      }
      cur = cur
        .withColumn(root, col(line))
        .withColumn(line, explode(elems))
    }
    val rootCol = if (featurePath.isDefined) col(root) else col(line)
    // ONE shared token array per record. Plain mode is a regex split on
    // the delimiter; csv mode (reference format = CSV/TSV/QUOTED —
    // DelimitedTextConverter.scala:37-46 over commons-csv) parses
    // RFC4180 quoting natively via from_csv (UnivocityParser, PERMISSIVE:
    // malformed fields null out, the parse-error skip). from_csv needs a
    // fixed width: the widest $N/Col reference across the fields.
    val toks = "__graft_toks"
    val tokensCol: Column = csv match {
      case None => split(col(line), java.util.regex.Pattern.quote(delimiter))
      case Some(opts) =>
        val dollarRe = """\$(\d+)""".r
        def maxDollar(e: String): Int =
          dollarRe.findAllMatchIn(e).map(_.group(1).toInt).maxOption.getOrElse(0)
        val maxRef = (fields.map(_.spec).collect { case Col(i) => i + 1 } ++
          fields.map(_.spec).collect {
            // every spec kind that can carry $N token refs counts toward
            // the csv schema width ($0 binds elsewhere for Path/XPath)
            case Transform(e) => maxDollar(e)
            case PathTransform(_, e, _) => maxDollar(e)
            case XPathTransform(_, e) => maxDollar(e)
            case FixedWidthTransform(_, _, e) => maxDollar(e)
          } :+ 1).max
        val schema = org.apache.spark.sql.types.StructType(
          (0 until maxRef).map(i =>
            org.apache.spark.sql.types.StructField(s"_c$i", org.apache.spark.sql.types.StringType)))
        val parsed = from_csv(col(line), schema,
          Map("sep" -> delimiter, "mode" -> "PERMISSIVE") ++ opts)
        array((0 until maxRef).map(i => parsed.getField(s"_c$i")): _*)
    }
    cur = cur.withColumn(toks, tokensCol)
    // ONE DOM parse per record (and one for the root document under an
    // XML feature-path): every xpath field reads from a shared evaluated
    // array instead of re-parsing the XML per field
    val xpathSpecs: Seq[String] = fields.map(_.spec).collect {
      case XPath(p) => p
      case XPathTransform(p, _) => p
    }.distinct
    val (absPaths, relPaths) = xpathSpecs.partition(_.startsWith("/"))
    var xpaths = Map.empty[String, Column]
    if (relPaths.nonEmpty) {
      cur = cur.withColumn("__graft_xp_rel", xmlExtractor(relPaths)(col(line)))
      xpaths ++= relPaths.zipWithIndex.map { case (p, i) =>
        p -> try_element_at(col("__graft_xp_rel"), lit(i + 1))
      }
    }
    if (absPaths.nonEmpty) {
      // absolute XPaths read the whole document under a feature-path
      cur = cur.withColumn("__graft_xp_abs", xmlExtractor(absPaths)(rootCol))
      xpaths ++= absPaths.zipWithIndex.map { case (p, i) =>
        p -> try_element_at(col("__graft_xp_abs"), lit(i + 1))
      }
    }
    fields.foreach { f =>
      val named = fields.takeWhile(_ ne f).map(p => p.name -> col(p.name)).toMap
      cur = cur.withColumn(f.name,
        extract(col(line), rootCol, col(toks), f, delimiter, named, caches, xpaths))
    }
    // parse-error skip: a row where every DECLARED field is null drops.
    // skipExempt names derived always-present fields (a uuid()/md5 fid)
    // that must not keep an otherwise-unparseable row alive.
    val skipFields = fields.filterNot(f => skipExempt.contains(f.name))
    val parsed = cur.select(fields.map(f => col(f.name)): _*)
      .where((if (skipFields.nonEmpty) skipFields else fields)
        .map(f => col(f.name).isNotNull).reduce(_ || _))
    (lonField, latField) match {
      case (Some(lo), Some(la)) =>
        parsed.withColumn("geom",
          graft.functions.StFunctions.stMakePoint(col(lo).cast("double"), col(la).cast("double")))
      case _ => parsed
    }
  }

  /** Read a text file and convert (the usual entry point). */
  def fromText(spark: SparkSession, path: String, fields: Seq[Field],
               delimiter: String = ",",
               lonField: Option[String] = None, latField: Option[String] = None,
               caches: Map[String, Transformers.SimpleCache] = Map.empty): DataFrame =
    convert(spark.read.text(path), "value", fields, delimiter, lonField, latField, caches)

  /** The scale path for enrichment lookups that don't fit a plan
    * literal: left broadcast-join the lookup table (the reference's
    * non-simple EnrichmentCache backends are external KV stores; on
    * Spark the idiomatic equivalent is a broadcast dimension join that
    * AQE keeps shuffle-free). Lookup columns join onto `df` by
    * `df(dfKey) == lookup(lookupKey)`; `lookupKey` itself is dropped. */
  def enrich(df: DataFrame, lookup: DataFrame, dfKey: String, lookupKey: String): DataFrame = {
    val renamed = lookup.withColumnRenamed(lookupKey, "__cache_key")
    df.join(broadcast(renamed), col(dfKey) === col("__cache_key"), "left")
      .drop("__cache_key")
  }

  /** Streaming entry point — the StreamDataStore analog (the reference's
    * generic stream source runs a converter over an arriving feed;
    * geomesa-stream): the SAME declarative field specs over
    * `readStream.text`, so a delimited/json/fixed-width line feed parses
    * inside a Structured Streaming scan and can flow straight into
    * ChangelogStream.materialize (demo: ChangelogStreamSpec). */
  def fromTextStream(spark: SparkSession, path: String, fields: Seq[Field],
                     delimiter: String = ",",
                     lonField: Option[String] = None, latField: Option[String] = None): DataFrame =
    convert(spark.readStream.text(path), "value", fields, delimiter, lonField, latField)

  /**
   * Composite converter: each route is (predicate on the raw line,
   * converter fields). A line is parsed by the FIRST matching route;
   * all routes must produce the same schema (the reference's composite
   * converter contract). Unmatched lines are dropped.
   */
  /** A composite route: predicate on the raw line, converter fields,
    * delimiter, and the route's own enrichment caches (caches scope to
    * the declaring converter, like the reference — a shared cache is
    * passed to every route explicitly). */
  /** A composite route is a FULL converter behind a predicate: it keeps
    * its own tokenization (csv), feature-path, and skip-exempt derived
    * fields — a route asking for RFC4180 quoting must not silently fall
    * back to a naive split. */
  final case class Route(pred: Column => Column, fields: Seq[Field], delimiter: String = ",",
                         caches: Map[String, Transformers.SimpleCache] = Map.empty,
                         featurePath: Option[String] = None,
                         csv: Option[Map[String, String]] = None,
                         xmlFeaturePath: Boolean = false,
                         skipExempt: Set[String] = Set.empty)

  def composite(df: DataFrame, lineCol: String,
                routes: Seq[Route],
                lonField: Option[String] = None, latField: Option[String] = None): DataFrame = {
    val parts = routes.zipWithIndex.map { case (r, i) =>
      // earlier routes win: exclude lines matched by any earlier route
      val notEarlier = routes.take(i).map(e => !coalesce(e.pred(col(lineCol)), lit(false)))
        .foldLeft(lit(true))(_ && _)
      convert(df.where(r.pred(col(lineCol)) && notEarlier), lineCol, r.fields, r.delimiter,
        lonField, latField, r.caches, r.featurePath, r.csv, r.xmlFeaturePath, r.skipExempt)
    }
    parts.reduce(_ union _)
  }
}
