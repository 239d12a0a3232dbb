package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Full JSON-path grammar + evaluator — the reference's kryo-json path
 * surface (geomesa-feature-kryo json/JsonPathParser.scala:99-140 grammar,
 * KryoJsonSerialization.scala:160-198 evaluation, :475-491 path
 * functions), re-expressed over Jackson instead of the reference's
 * kryo-serialized document walk.
 *
 * Grammar (JsonPathParserTest): `$` root; `.name` attributes;
 * `[name]` / `['name']` bracketed attributes (dots/spaces/dashes);
 * `[2]` / `[2,3,4]` / `[2:4]` array indices (range upper-exclusive);
 * `.*` attribute wildcard; `[*]` index wildcard; `..` deep scan
 * (followed by an attribute, bracketed attribute, or wildcard); one
 * trailing function `.min()|.max()|.avg()|.length()`.
 *
 * Evaluation (KryoJsonSerializationTest "correctly deserialize
 * json-path"): zero matches -> null; one match -> the scalar; many ->
 * a Seq. Arrays convert to Seq, objects render as compact JSON
 * strings. Deep scan visits the node itself plus every descendant
 * container in document order. Functions apply per match: length of a
 * Seq/String, min/max/avg over a Seq's numeric view (Double).
 *
 * Scale shape: parsing happens once at plan time; only paths the
 * codegen `get_json_object` cannot express (deep scan, wildcards,
 * multi-index, functions) evaluate per row, and that walk is a single
 * Jackson parse per row with no allocation beyond the match list.
 */
object JsonPath {

  sealed trait PathElement
  final case class PathAttribute(name: String, bracketed: Boolean = false) extends PathElement
  final case class PathIndex(index: Int) extends PathElement
  final case class PathIndices(indices: Seq[Int]) extends PathElement
  case object PathAttributeWildCard extends PathElement
  case object PathIndexWildCard extends PathElement
  case object PathDeepScan extends PathElement
  final case class PathFunction(function: String) extends PathElement // min | max | avg | length

  private val Functions = Set("min", "max", "avg", "length")

  private def identChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '-'

  /** Parse a json path; throws IllegalArgumentException on malformed
    * input (the reference's ParsingException). */
  def parse(path: String): Seq[PathElement] = {
    require(path != null && path.startsWith("$"), s"json path must start with '$$': $path")
    val out = Vector.newBuilder[PathElement]
    val n = path.length
    var i = 1
    var sawFunction = false
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"invalid json path '$path' at $i: $msg")
    def bracket(): Unit = { // at '['
      val close = path.indexOf(']', i)
      if (close < 0) fail("unbalanced '['")
      val inner = path.substring(i + 1, close)
      i = close + 1
      if (inner == "*") out += PathIndexWildCard
      else if (inner.startsWith("'")) {
        if (!inner.endsWith("'") || inner.length < 2) fail("unterminated quoted attribute")
        out += PathAttribute(inner.substring(1, inner.length - 1), bracketed = true)
      } else if (inner.matches("""-?\d+""")) out += PathIndex(inner.toInt)
      else if (inner.matches("""-?\d+(,-?\d+)+""")) out += PathIndices(inner.split(',').toIndexedSeq.map(_.toInt))
      else if (inner.matches("""-?\d+:-?\d+""")) {
        val Array(a, b) = inner.split(':')
        out += PathIndices(a.toInt until b.toInt)
      } else if (inner.nonEmpty && inner.forall(identChar)) out += PathAttribute(inner, bracketed = true)
      else fail(s"unparseable bracket contents '$inner'")
    }
    var justScanned = false // the previous loop step emitted `..`'s DeepScan
    while (i < n) {
      if (sawFunction) fail("a path function must be the last element")
      val wasScanned = justScanned
      justScanned = false
      path.charAt(i) match {
        case '.' if i + 1 < n && path.charAt(i + 1) == '*' =>
          out += PathAttributeWildCard; i += 2
        case '.' if i + 1 < n && path.charAt(i + 1) == '.' =>
          // deep scan: one dot consumed, the next element must be an
          // attribute / bracketed attribute / wildcard (grammar :116)
          out += PathDeepScan
          justScanned = true
          i += 1 // next loop iteration parses the scanned `.name` / `.*`
        case '.' if i + 1 < n && path.charAt(i + 1) == '[' =>
          // `.['name']` — the grammar's DeepScan alternative with a
          // bracketed attribute (JsonPathParser.scala:116; exercised by
          // JsonPathFilterFunctionTest's $.json.['foo.foo'] forms).
          // After `..` the DeepScan is already emitted — `$..['x']` is
          // ONE scan, not two.
          if (!wasScanned) out += PathDeepScan
          i += 1
          bracket()
        case '.' =>
          val start = i + 1
          var j = start
          while (j < n && identChar(path.charAt(j))) j += 1
          if (j == start) fail("empty attribute name")
          val name = path.substring(start, j)
          if (j + 1 < n && path.charAt(j) == '(' && path.charAt(j + 1) == ')') {
            if (!Functions.contains(name)) fail(s"unknown path function '$name'")
            out += PathFunction(name); sawFunction = true; i = j + 2
          } else { out += PathAttribute(name); i = j }
        case '[' => bracket()
        case c => fail(s"unexpected character '$c'")
      }
    }
    val result = out.result()
    // a trailing bare deep-scan ("$..") has no element to scan for
    if (result.lastOption.contains(PathDeepScan)) fail("dangling deep scan")
    result
  }

  /** True when `get_json_object` can evaluate the path (attributes +
    * single indices only, no function) — the codegen fast path. */
  def isDefinite(path: Seq[PathElement]): Boolean = path.forall {
    case _: PathAttribute | _: PathIndex => true
    case _ => false
  }

  // ---- evaluation -----------------------------------------------------

  private val mapper = new ObjectMapper()

  private def childValues(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    if (n.isObject) { val it = n.elements(); while (it.hasNext) b += it.next() }
    b.result()
  }

  private def arrayElements(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) (0 until n.size).map(n.get) else Nil

  /** The nodes plus every descendant container, in BREADTH-FIRST order —
    * the reference's matchDeep is a queue walk (KryoJsonSerialization
    * .scala:407-422), so sibling containers at one depth all precede any
    * deeper container in the match order. */
  private def scanSet(ns: Seq[JsonNode]): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    val queue = scala.collection.mutable.Queue[JsonNode](ns: _*)
    while (queue.nonEmpty) {
      val x = queue.dequeue()
      b += x
      val it = x.elements()
      while (it.hasNext) { val c = it.next(); if (c.isContainerNode) queue.enqueue(c) }
    }
    b.result()
  }

  private def matchNodes(root: JsonNode, path: Seq[PathElement]): (Seq[JsonNode], Option[String]) = {
    var matches: Seq[JsonNode] = Seq(root)
    var fn: Option[String] = None
    path.foreach {
      case PathAttribute(name, _) =>
        matches = matches.flatMap(m => if (m.isObject && m.has(name)) Some(m.get(name)) else None)
      case PathAttributeWildCard =>
        // objects only — the reference's matchPathAttribute collects
        // DocByte positions exclusively (KryoJsonSerialization.scala:343)
        matches = matches.flatMap(m => if (m.isObject) childValues(m) else Nil)
      case PathIndex(ix) => matches = matches.flatMap(m => if (m.isArray && ix >= 0 && ix < m.size) Some(m.get(ix)) else None)
      case PathIndices(is) => matches = matches.flatMap(m => if (m.isArray) is.filter(ix => ix >= 0 && ix < m.size).map(m.get) else Nil)
      case PathIndexWildCard => matches = matches.flatMap(arrayElements)
      case PathDeepScan => matches = scanSet(matches)
      case PathFunction(f) => fn = Some(f)
    }
    (matches, fn)
  }

  /** Reference value mapping: strings unquoted, integral numbers as
    * Int/Long, floats as Double, arrays as Seq, objects as compact
    * JSON text (KryoJsonSerializationTest's expected values). */
  private def toValue(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isTextual) n.textValue
    else if (n.isBoolean) n.booleanValue
    else if (n.isIntegralNumber) { val l = n.longValue; if (l >= Int.MinValue && l <= Int.MaxValue) l.toInt else l }
    else if (n.isNumber) n.doubleValue
    else if (n.isArray) arrayElements(n).map(toValue)
    else n.toString

  /** Reference applyPathFunction (KryoJsonSerialization.scala:475-491):
    * same numeric coercion (null counts as 0.0), but a non-numeric
    * element degrades to null instead of throwing — a per-row grammar
    * mismatch is dirty data, not a reason to fail the whole scan. */
  private def applyFunction(f: String, v: Any): Any = {
    def toNum(x: Any): Double = x match {
      case num: Number => num.doubleValue
      case null => 0.0
      case other => other.toString.toDouble
    }
    try {
      v match {
        case s: Seq[_] => f match {
          case "length" => s.length
          case "avg" => if (s.isEmpty) null else s.map(toNum).sum / s.length
          case "min" => if (s.isEmpty) null else s.map(toNum).min
          case "max" => if (s.isEmpty) null else s.map(toNum).max
        }
        case s: String if f == "length" => s.length
        case _ => null
      }
    } catch { case _: NumberFormatException => null }
  }

  /** Evaluate with the reference's result shape: null / scalar / Seq.
    * Malformed JSON evaluates to null (ingest-scan semantics). */
  def evaluate(json: String, path: Seq[PathElement]): Any = {
    if (json == null) return null
    val root = try mapper.readTree(json) catch { case _: Exception => return null }
    if (root == null) return null
    val (matches, fn) = matchNodes(root, path)
    val values = matches.map(toValue)
    val mapped = fn match {
      case None => values
      case Some(f) => values.map(applyFunction(f, _))
    }
    if (mapped.isEmpty) null
    else if (mapped.lengthCompare(1) == 0) mapped.head
    else mapped
  }

  /** SQL rendering (the jsonPath() Column surface for paths beyond
    * get_json_object): scalars as their text (strings unquoted, like
    * get_json_object), containers / multi-match as compact JSON. */
  def render(json: String, path: Seq[PathElement]): String = {
    if (json == null) return null
    val root = try mapper.readTree(json) catch { case _: Exception => return null }
    if (root == null) return null
    val (matches, fn) = matchNodes(root, path)
    fn match {
      case Some(f) =>
        if (matches.isEmpty) null
        else {
          val mapped = matches.map(m => applyFunction(f, toValue(m)))
          val one = if (mapped.lengthCompare(1) == 0) mapped.head else mapped
          one match {
            case null => null
            case s: Seq[_] => s.map(x => if (x == null) "null" else x.toString).mkString("[", ",", "]")
            case other => other.toString
          }
        }
      case None =>
        if (matches.isEmpty) null
        else if (matches.lengthCompare(1) == 0) {
          val m = matches.head
          if (m.isTextual) m.textValue else m.toString
        } else {
          val arr = mapper.createArrayNode()
          matches.foreach(arr.add)
          arr.toString
        }
    }
  }
}
