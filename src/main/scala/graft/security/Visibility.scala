package graft.security

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Accumulo-style visibility-label row security — the Spark analog of the
 * reference's VisibilityEvaluator (geomesa-security/src/main/scala/org/
 * locationtech/geomesa/security/VisibilityEvaluator.scala:22-148) and the
 * per-row visibility filter every GeoMesa datastore applies at scan time.
 *
 * Grammar (matches the reference's parboiled rules at
 * VisibilityEvaluator.scala:128-147 — note OR binds TIGHTER than AND):
 * {{{
 *   expression := term ('&' term)*          // AND of terms
 *   term       := factor ('|' factor)*      // OR of factors
 *   factor     := token | 'token' | "token" | '(' expression ')'
 *   token      := [A-Za-z0-9_\-:./]+        // Accumulo's valid auth chars
 * }}}
 * An empty / null visibility is visible to everyone (VisibilityNone).
 *
 * Spark-first shape: the evaluator runs as a scalar predicate inside the
 * scan's filter (so column pruning / partition pruning still apply and
 * the filter pipelines inside whole-stage codegen's consumer). The parse
 * is memoized per executor — visibility strings are low-cardinality by
 * construction (they label policy classes, not rows), so steady-state
 * evaluation is a hash-map hit + boolean tree walk, the same cost profile
 * as Accumulo's server-side VisibilityFilter.
 */
object Visibility {

  sealed trait Expr { def evaluate(auths: Set[String]): Boolean }
  case object VisNone extends Expr { def evaluate(auths: Set[String]): Boolean = true }
  final case class Value(token: String) extends Expr {
    def evaluate(auths: Set[String]): Boolean = auths.contains(token)
  }
  final case class And(children: Seq[Expr]) extends Expr {
    def evaluate(auths: Set[String]): Boolean = children.forall(_.evaluate(auths))
  }
  final case class Or(children: Seq[Expr]) extends Expr {
    def evaluate(auths: Set[String]): Boolean = children.exists(_.evaluate(auths))
  }

  private def isAuthChar(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '_' || c == '-' || c == ':' || c == '.' || c == '/'

  /** Recursive-descent parse of one visibility string. */
  def parse(visibility: String): Expr = {
    if (visibility == null || visibility.isEmpty) return VisNone
    var i = 0
    val s = visibility
    def fail(msg: String) =
      throw new IllegalArgumentException(s"invalid visibility '$s' at ${i}: $msg")
    def factor(): Expr = {
      if (i >= s.length) fail("expected a token or '('")
      s.charAt(i) match {
        case '(' =>
          i += 1
          val e = expression()
          if (i >= s.length || s.charAt(i) != ')') fail("expected ')'")
          i += 1
          e
        case q @ ('\'' | '"') =>
          i += 1
          val start = i
          while (i < s.length && s.charAt(i) != q) i += 1
          if (i >= s.length) fail(s"unterminated $q-quote")
          val tok = s.substring(start, i)
          i += 1
          if (tok.isEmpty || !tok.forall(isAuthChar)) fail(s"invalid auth token '$tok'")
          Value(tok)
        case c if isAuthChar(c) =>
          val start = i
          while (i < s.length && isAuthChar(s.charAt(i))) i += 1
          Value(s.substring(start, i))
        case c => fail(s"unexpected '$c'")
      }
    }
    def term(): Expr = {
      val parts = Seq.newBuilder[Expr]
      parts += factor()
      while (i < s.length && s.charAt(i) == '|') { i += 1; parts += factor() }
      val es = parts.result()
      if (es.length == 1) es.head else Or(es)
    }
    def expression(): Expr = {
      val parts = Seq.newBuilder[Expr]
      parts += term()
      while (i < s.length && s.charAt(i) == '&') { i += 1; parts += term() }
      val es = parts.result()
      if (es.length == 1) es.head else And(es)
    }
    val e = expression()
    if (i != s.length) fail("trailing input")
    e
  }

  /** Parse-once check of one visibility against an auth set. */
  def canSee(visibility: String, auths: Set[String]): Boolean =
    parse(visibility).evaluate(auths)

  // per-executor memo (bounded: visibility strings are policy classes,
  // but a hostile/degenerate input must not grow the map without limit)
  private val cacheMax = 10000
  @transient private lazy val cache = new ConcurrentHashMap[String, Expr]()
  private def cached(vis: String): Expr = {
    val hit = cache.get(vis)
    if (hit != null) hit
    else {
      val e = parse(vis)
      if (cache.size < cacheMax) cache.put(vis, e)
      e
    }
  }

  /** Column predicate: true iff the row's visibility admits `auths`.
    * Null/empty visibility is unrestricted, like the reference. */
  def authorized(visCol: Column, auths: Seq[String]): Column = {
    val authSet = auths.toSet // serialized into the task closure once
    val ok = udf { vis: String =>
      if (vis == null || vis.isEmpty) true else cached(vis).evaluate(authSet)
    }
    ok(visCol)
  }

  /** Scan-time row filter — the VisibilityFilter analog. */
  def filterAuthorized(df: DataFrame, visCol: String, auths: Seq[String]): DataFrame =
    df.where(authorized(col(visCol), auths))

  /** Attribute-level visibility — the reference's
    * `geomesa.visibility.level='attribute'` mode
    * (AccumuloDataStoreAttributeVisibilityTest:30-120): `visCol` holds
    * one comma-separated visibility per attribute of `attrs`, in order.
    * Unauthorized attributes read as null; a row survives iff at least
    * one of its attributes is authorized (the reference returns such
    * partially-visible features). A missing/empty per-attribute label is
    * unrestricted, like the row form. */
  def maskAttributes(df: DataFrame, visCol: String, attrs: Seq[String],
                     auths: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "no attributes to mask")
    val parts = split(col(visCol), ",")
    def attrOk(i: Int): Column = authorized(try_element_at(parts, lit(i + 1)), auths)
    // keep is decided on the ORIGINAL labels before any masking
    val keep = attrs.indices.map(attrOk).reduce(_ || _)
    val masked = attrs.zipWithIndex.foldLeft(df) { case (d, (a, i)) =>
      d.withColumn(a, when(attrOk(i), col(a)))
    }
    masked.where(keep)
  }
}
