package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference converter framework's transform-expression language
 * (geomesa-convert-common Transformers.scala — the `transform = "..."`
 * strings in every converter config, exercised by TransformersTest),
 * compiled to ONE Catalyst `Column` instead of interpreted per record:
 * a field transform like `concat(trim($1), '-', $2::int)` becomes a
 * codegen'd Spark expression over the record's split tokens.
 *
 * Supported surface (everything TransformersTest exercises):
 *  - field refs `$0` (whole record) / `$N` (1-based token) / `$name`
 *  - literals: 'str' (\' escapes), ints, 1L, 1.5f/1.5d/.5, booleans, null
 *  - casts `::int|integer|long|float|double|boolean|bool|string`, `::r`
 *  - strings: trim capitalize lowercase uppercase regexReplace substr
 *    substring strlen length toString concat mkstring emptyToNull printf
 *  - dates: date datetime dateTime isodate basicDate isodatetime
 *    basicDateTime basicDateTimeNoMillis dateHourMinuteSecondMillis
 *    millisToDate secsToDate dateToString now
 *  - geometry: point linestring polygon multipoint multilinestring
 *    multipolygon geometry geometrycollection (WKT or (x, y) -> WKB)
 *  - ids/hashes: md5 uuid base64
 *  - math: add subtract multiply divide mean min max
 *  - error handling: try(expr, default), stringToInt/Integer/Long/
 *    Float/Double/Boolean(x, default)
 *  - predicates (parsePredicate): strEq intEq integerEq longEq floatEq
 *    doubleEq boolEq lt lteq gt gteq not and or
 *
 * Out of scope (documented): uuidZ3 / uuidZ3Centroid (the reference
 * embeds a z3 in a UUID for row-key sharding — our tables shard on the
 * packed cell itself), and scripting functions (no JSR-223 engine use
 * inside codegen). Enrichment lookups ARE supported: `cacheLookup(name,
 * key, field)` over SimpleCache inline data (the reference's
 * EnrichmentCacheFunctionFactory, convert/Transformers.scala:878-887);
 * lookups too large for a plan literal go through the broadcast-join
 * path (Converters.enrich) instead.
 */
object Transformers {

  /** An enrichment cache for `cacheLookup('name', key, 'field')` — the
    * reference's `caches = { name = { type = "simple", data = {...}}}`
    * converter sections (EnrichmentCacheTest). Inline data compiles to a
    * literal map in the plan (broadcast with the task binaries, pure
    * codegen lookup): key -> field -> value. */
  final case class SimpleCache(data: Map[String, Map[String, String]])

  /** Compile a transform expression. `token(n)` supplies `$n`
    * (token(0) = the whole record); `named` supplies `$name` refs. */
  def compile(expr: String, token: Int => Column,
              named: Map[String, Column] = Map.empty,
              caches: Map[String, SimpleCache] = Map.empty): Column =
    new Parser(expr, token, named, caches).parseAll()

  /** Compile a predicate expression (boolean Column). */
  def compilePredicate(expr: String, token: Int => Column,
                       named: Map[String, Column] = Map.empty,
                       caches: Map[String, SimpleCache] = Map.empty): Column =
    compile(expr, token, named, caches) // predicates share the grammar

  /** Convenience binding for delimited records: $0 = the line, $N = the
    * N-th delimiter-separated token. */
  def forDelimited(expr: String, line: Column, delimiter: String = ",",
                   named: Map[String, Column] = Map.empty,
                   caches: Map[String, SimpleCache] = Map.empty): Column =
    compile(expr, {
      case 0 => line
      case n => try_element_at(split(line, java.util.regex.Pattern.quote(delimiter)), lit(n))
    }, named, caches)

  // ---- parser ----------------------------------------------------------

  private final class Parser(input: String, token: Int => Column, named: Map[String, Column],
                             caches: Map[String, SimpleCache]) {
    private var pos = 0

    def parseAll(): Column = {
      val c = expr()
      skipWs()
      require(pos >= input.length, s"trailing input at $pos in: $input")
      c
    }

    private def skipWs(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < input.length) input(pos) else '\u0000'
    private def eat(c: Char): Unit = {
      skipWs()
      require(peek == c, s"expected '$c' at $pos in: $input")
      pos += 1
    }

    private def expr(): Column = {
      skipWs()
      var c = atom()
      // casts bind tightly and chain
      while ({ skipWs(); pos + 1 < input.length && input(pos) == ':' && input(pos + 1) == ':' }) {
        pos += 2
        val t = ident()
        c = castTo(c, t)
      }
      c
    }

    private def atom(): Column = {
      skipWs()
      peek match {
        case '$' => pos += 1; ref()
        case '\'' => lit(quoted())
        case ch if ch.isDigit || ch == '-' || ch == '.' => number()
        case _ =>
          val name = ident()
          skipWs()
          if (peek == '(') {
            eat('(')
            if (name == "cacheLookup") cacheLookupCall()
            else if (name == "jsonList" || name == "jsonMap") jsonCollectionCall(name)
            else if (name == "avroPath") avroPathCall()
            else fn(name, args())
          }
          else name match {
            case "true" => lit(true)
            case "false" => lit(false)
            case "null" => lit(null)
            case other => throw new IllegalArgumentException(s"unknown token '$other' in: $input")
          }
      }
    }

    private def ref(): Column = {
      if (peek.isDigit) {
        val s = pos
        while (pos < input.length && input(pos).isDigit) pos += 1
        token(input.substring(s, pos).toInt)
      } else {
        val name = ident()
        named.getOrElse(name,
          throw new IllegalArgumentException(s"unknown named field '$$$name' in: $input"))
      }
    }

    private def ident(): String = {
      skipWs()
      val s = pos
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
      require(pos > s, s"expected identifier at $pos in: $input")
      input.substring(s, pos)
    }

    /** avroPath(recordExpr, '/path') — the geomesa-convert-avro
      * selection DSL (see [[AvroPath]]); the path must be a string
      * literal, like the reference's usage. */
    private def avroPathCall(): Column = {
      val base = expr()
      skipWs(); eat(',')
      skipWs()
      val path = quoted()
      skipWs(); eat(')')
      AvroPath.over(base, path)
    }

    /** cacheLookup('cache', keyExpr, 'field') — cache and field names
      * must be string literals (same as the reference's usage); the
      * lookup compiles to element_at over a literal map, null when the
      * key is absent. */
    private def cacheLookupCall(): Column = {
      skipWs()
      val cname = quoted()
      skipWs(); eat(',')
      val key = expr()
      skipWs(); eat(',')
      skipWs()
      val field = quoted()
      skipWs(); eat(')')
      val cache = caches.getOrElse(cname, throw new IllegalArgumentException(
        s"unknown cache '$cname' (declared caches: ${caches.keys.mkString(", ")}) in: $input"))
      val flat: Map[String, String] =
        cache.data.flatMap { case (k, fs) => fs.get(field).map(k -> _) }
      if (flat.isEmpty) lit(null).cast("string")
      else element_at(typedLit(flat), key.cast("string"))
    }

    /** jsonList('elemType', $jsonArray) / jsonMap('valueType', $jsonObj) —
      * the reference's typed JSON collection attributes
      * (JsonConverterTest "parse list and map attributes"): the element
      * type is a compile-time string literal, so the value compiles to a
      * native from_json with a fixed schema (UUIDs ride as strings —
      * Spark has no UUID type). */
    private def jsonCollectionCall(name: String): Column = {
      def sqlType(): String = {
        skipWs()
        quoted().toLowerCase match {
          case "int" | "integer" => "int"
          case "long" => "bigint"
          case "float" => "float"
          case "double" => "double"
          case "bool" | "boolean" => "boolean"
          case "string" | "uuid" => "string"
          case other => throw new IllegalArgumentException(
            s"unsupported $name element type '$other' in: $input")
        }
      }
      val t1 = sqlType()
      skipWs(); eat(',')
      // jsonMap('keyType','valueType', $obj) takes a second type arg
      val t2 = if (name == "jsonMap") { val t = sqlType(); skipWs(); eat(','); t } else ""
      val v = expr()
      skipWs(); eat(')')
      // from_json only accepts STRING map keys: parse with string keys,
      // drop entries whose key does NOT cast to the requested type (a
      // null map key would fail the job — the converter contract is
      // malformed data nulls out, never kills), then re-type the rest.
      // Two distinct raw keys casting to the same value ("1"/"01") still
      // fail with DUPLICATED_MAP_KEY — genuinely ambiguous data.
      val ddl = if (name == "jsonList") s"array<$t1>" else s"map<string,$t2>"
      val parsed = from_json(v.cast("string"), lit(ddl), new java.util.HashMap[String, String]())
      if (name == "jsonMap" && t1 != "string")
        transform_keys(map_filter(parsed, (k, _) => k.try_cast(t1).isNotNull),
          (k, _) => k.try_cast(t1))
      else parsed
    }

    private def quoted(): String = {
      // Java-style escapes, matching the reference's unescapeJava over its
      // non-greedy literal (EnhancedTokenParsers.scala:21-25): \\ \' \"
      // \b \f \n \r \t \uXXXX. Crucially \\ consumes BOTH chars, so a
      // literal ending in a backslash ('a\\') cannot swallow its closing
      // quote; an unknown escape keeps the char (unescapeJava behavior).
      eat('\'')
      val sb = new StringBuilder
      var closed = false
      while (!closed) {
        require(pos < input.length, s"unterminated string in: $input")
        input(pos) match {
          case '\'' => closed = true; pos += 1
          case '\\' =>
            require(pos + 1 < input.length, s"unterminated string in: $input")
            input(pos + 1) match {
              case 'u' =>
                require(pos + 5 < input.length, s"bad \\u escape in: $input")
                sb += Integer.parseInt(input.substring(pos + 2, pos + 6), 16).toChar
                pos += 6
              case c =>
                sb += (c match {
                  case 'b' => '\b'; case 'f' => '\f'; case 'n' => '\n'
                  case 'r' => '\r'; case 't' => '\t'; case other => other
                })
                pos += 2
            }
          case c => sb += c; pos += 1
        }
      }
      sb.toString
    }

    private def number(): Column = {
      val s = pos
      if (peek == '-') pos += 1
      var isFloat = false
      while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) {
        if (input(pos) == '.') isFloat = true
        pos += 1
      }
      val body = input.substring(s, pos)
      peek match {
        case 'L' | 'l' => pos += 1; lit(body.toLong)
        case 'f' | 'F' => pos += 1; lit(body.toFloat)
        case 'd' | 'D' => pos += 1; lit(body.toDouble)
        case _ => if (isFloat) lit(body.toDouble) else lit(body.toInt)
      }
    }

    private def args(): Seq[Column] = {
      skipWs()
      if (peek == ')') { pos += 1; return Nil }
      val out = scala.collection.mutable.ArrayBuffer(expr())
      skipWs()
      while (peek == ',') { pos += 1; out += expr(); skipWs() }
      eat(')')
      out.toSeq
    }
  }

  // ---- semantics ---------------------------------------------------------

  // try_cast, not cast: under ANSI mode a plain cast THROWS on malformed
  // input, which would make `try($1::int, 0)` unable to catch anything
  // (try() compiles to coalesce). try_cast nulls the bad value — the
  // reference's ErrorMode.SkipBadRecords semantics, same as Converters
  private def castTo(c: Column, t: String): Column = t match {
    case "int" | "integer" => c.try_cast("int")
    case "long" => c.try_cast("long")
    case "float" => c.try_cast("float")
    case "double" => c.try_cast("double")
    case "bool" | "boolean" => c.try_cast("boolean")
    case "string" => c.cast("string")
    case "r" => c // regex literal marker: regexReplace consumes the raw pattern
    case other => throw new IllegalArgumentException(s"unknown cast ::$other")
  }

  private val G = graft.functions.StFunctions

  private val tryWktUdf = udf(graft.geom.GeomOps.wktToWkbOrNull _)

  // java.time patterns of the reference's joda-named formats
  private val NamedDateFormats = Map(
    "datetime" -> "yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX",
    "dateTime" -> "yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX",
    "isodate" -> "yyyyMMdd",
    "basicDate" -> "yyyyMMdd",
    "isodatetime" -> "yyyyMMdd'T'HHmmss[.SSS]XXX",
    "basicDateTime" -> "yyyyMMdd'T'HHmmss[.SSS]XXX",
    "basicDateTimeNoMillis" -> "yyyyMMdd'T'HHmmssXXX",
    // [XXX]: the reference docs' own example data carries a trailing
    // 'Z' (example.rst) — XXX parses it as UTC when present
    "dateHourMinuteSecondMillis" -> "yyyy-MM-dd'T'HH:mm:ss.SSS[XXX]")

  private def str(c: Column): Column = c.cast("string")

  private def fn(name: String, a: Seq[Column]): Column = name match {
    // -- strings
    case "trim" => trim(a.head)
    case "capitalize" => // FIRST char only (initcap would touch every word)
      concat(upper(a.head.substr(lit(1), lit(1))), a.head.substr(lit(2), length(a.head)))
    case "lowercase" => lower(a.head)
    case "uppercase" => upper(a.head)
    case "regexReplace" => regexp_replace(a(2), a(0).cast("string"), a(1))
    case "substr" | "substring" => // java substring(begin, end), 0-based
      a(0).substr(a(1) + lit(1), a(2) - a(1))
    case "strlen" | "length" => length(a.head)
    case "toString" => str(a.head)
    // `concatenate` is the reference docs' long-form alias
    // (docs/user/convert/example.rst "concatenate($1, $2)")
    case "concat" | "concatenate" => concat(a.map(str): _*)
    case "mkstring" => // mkstring(sep, args...): join with the separator
      a.tail.map(str).reduce((x, y) => concat(x, str(a.head), y))
    case "emptyToNull" => when(trim(a.head) === "" || a.head.isNull, lit(null)).otherwise(a.head)
    case "printf" => call_function("format_string", a: _*)
    // -- dates (null on malformed input — the engine's bad-values-are-data
    // stance; the reference throws unless wrapped in try())
    case "date" => call_function("try_to_timestamp", a(1).cast("string"), a(0))
    case d if NamedDateFormats.contains(d) =>
      call_function("try_to_timestamp", a.head, lit(NamedDateFormats(d)))
    case "millisToDate" => timestamp_millis(a.head.cast("string").try_cast("long"))
    case "secsToDate" => timestamp_seconds(a.head.cast("string").try_cast("long"))
    case "dateToString" => call_function("date_format", a(1), a(0))
    case "now" => current_timestamp()
    case "try" => coalesce(a(0), a(1))
    // -- geometry (WKB columns like the rest of the engine).
    // try_cast, not cast: these run inside ingest scans under ANSI mode,
    // where one malformed value must null the field (the reference's
    // ErrorMode row skip), never fail the whole job.
    case "point" if a.size == 2 => G.stMakePoint(a(0).try_cast("double"), a(1).try_cast("double"))
    case "point" | "linestring" | "polygon" | "multipoint" | "multilinestring" |
         "multipolygon" | "geometry" | "geometrycollection" =>
      // lenient WKT: the reference's converter catches per-feature
      // transform exceptions and skips the feature; the Column analog is
      // a nulled field (st_geomFromWKT itself throws, as its tests require)
      tryWktUdf(a.head.cast("string"))
    // -- ids / hashes
    case "md5" => md5(a.head.cast("binary"))
    case "uuid" => expr("uuid()")
    case "base64" => base64(a.head.cast("binary"))
    // -- math (double semantics like the reference; try_cast as above)
    case "add" => a.map(_.try_cast("double")).reduce(_ + _)
    case "subtract" => a.map(_.try_cast("double")).reduce(_ - _)
    case "multiply" => a.map(_.try_cast("double")).reduce(_ * _)
    case "divide" => a.map(_.try_cast("double")).reduce(_ / _)
    case "mean" => a.map(_.try_cast("double")).reduce(_ + _) / lit(a.size.toDouble)
    case "min" => least(a.map(_.try_cast("double")): _*)
    case "max" => greatest(a.map(_.try_cast("double")): _*)
    // -- stringTo with default
    case "stringToInt" | "stringToInteger" => withDefault(a, "int")
    case "stringToLong" => withDefault(a, "long")
    case "stringToFloat" => withDefault(a, "float")
    case "stringToDouble" => withDefault(a, "double")
    case "stringToBoolean" => withDefault(a, "boolean")
    // -- predicates
    case "strEq" => a(0).cast("string") === a(1).cast("string")
    case "intEq" | "integerEq" => a(0).cast("int") === a(1).cast("int")
    case "longEq" => a(0).cast("long") === a(1).cast("long")
    case "floatEq" => a(0).cast("float") === a(1).cast("float")
    case "doubleEq" => a(0).cast("double") === a(1).cast("double")
    case "boolEq" => a(0).cast("boolean") === a(1).cast("boolean")
    case "lt" => a(0).cast("double") < a(1).cast("double")
    case "lteq" => a(0).cast("double") <= a(1).cast("double")
    case "gt" => a(0).cast("double") > a(1).cast("double")
    case "gteq" => a(0).cast("double") >= a(1).cast("double")
    case "not" => !a.head
    case "and" => a.reduce(_ && _)
    case "or" => a.reduce(_ || _)
    case other => throw new IllegalArgumentException(s"unknown transform function '$other'")
  }

  private def withDefault(a: Seq[Column], t: String): Column =
    coalesce(a(0).cast("string").try_cast(t), if (a.size > 1) a(1) else lit(null))
}
