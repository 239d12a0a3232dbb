package graft.plans

/**
 * Cost-based scan-strategy selection — the reference's StrategyDecider
 * (geomesa-index-api/.../planning/StrategyDecider.scala:47-63 over the
 * per-index strategies in index/strategies/): split the filter into
 * top-level conjuncts, offer each eligible index its primary conjunct,
 * cost every offer with the reference's STATIC model, and scan through
 * the cheapest with the remaining conjuncts as the residual filter.
 *
 * Static costs (the reference's, in the absence of stats):
 *  - id lookup: 1                (IdFilterStrategy.scala:49)
 *  - attribute equals: 100       (AttributeFilterStrategy.scala:83)
 *  - attribute range: 250        (AttributeFilterStrategy.scala:84)
 *  - z3 (spatial AND temporal): 200  (SpatioTemporalFilterStrategy.scala:74)
 *  - z2 (spatial only): 400      (SpatialFilterStrategy.scala:58)
 *  - temporal only: 401          (SpatioTemporalFilterStrategy.scala:66 —
 *                                 the "geom missing" degraded cost)
 *  - full scan: Long.MaxValue
 *
 * Spark difference: the "z" strategies are not separate physical
 * layouts here — the primary snapshot's SpatialFilterRule pushdown
 * already derives cell ranges from spatial/temporal conjuncts — so z2/
 * z3/full all route to the primary scan and their costs only compete
 * against the id/attribute layouts. Classification is TEXTUAL (the
 * conjunct substrings feed plans/Cql verbatim); the decider never
 * evaluates anything itself, so deciding is O(filter length) on the
 * driver.
 */
object StrategyDecider {

  sealed trait Strategy
  /** Direct feature-id lookup through the id index. */
  final case class IdLookup(values: Seq[String]) extends Strategy
  /** Equality (or IN) scan through an attribute index. */
  final case class AttrEquals(attr: String, values: Seq[String]) extends Strategy
  /** BETWEEN scan through an attribute index's sorted files. */
  final case class AttrRange(attr: String, lo: String, hi: String) extends Strategy
  /** Primary snapshot scan (SpatialFilterRule pushdown + refine). */
  case object ZScan extends Strategy

  /** A costed plan: the chosen strategy, and the conjuncts left to
    * evaluate as the residual ("secondary") filter. */
  final case class Decision(strategy: Strategy, residual: Option[String], cost: Long)

  // the one spatial-operator list, shared with the filter compiler
  private val SpatialOps = Cql.SpatialOps
  private val TemporalOps = Set("DURING", "BEFORE", "AFTER", "TEQUALS")

  private def idIdent(s: String): Boolean =
    s.headOption.exists(c => c.isLetter || c == '_') &&
      s.forall(c => c.isLetterOrDigit || c == '_')

  /** Strip one level of wrapping parens so `(a = 'x')` classifies. */
  @annotation.tailrec
  private def unwrap(c: String): String = {
    val t = c.trim
    if (t.startsWith("(") && t.endsWith(")")) {
      // only when the opener matches the LAST char
      var depth = 0; var matchAt = -1; var i = 0
      while (i < t.length && matchAt < 0) {
        t.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) matchAt = i
          case _ =>
        }
        i += 1
      }
      if (matchAt == t.length - 1) unwrap(t.substring(1, t.length - 1)) else t
    } else t
  }

  private val QuotedLit = """(?s)^'((?:[^']|'')*)'$""".r
  private val NumberLit = """^-?\d+(?:\.\d+)?$""".r
  /** The literal values of an IN list: every comma-separated item must
    * be a quoted string or a bare number, else None — a partially
    * parsed list must NOT drive the scan (the routed conjunct is
    * removed from the residual, so dropping a value would silently
    * lose rows). */
  private def literals(s: String): Option[Seq[String]] = {
    // split on commas outside quotes
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ',' if !inQuote => items += cur.result(); cur.clear()
      case c => cur += c
    }
    items += cur.result()
    val parsed = items.map(_.trim).map {
      case QuotedLit(v) => Some(v.replace("''", "'"))
      case n if NumberLit.findFirstIn(n).isDefined => Some(n)
      case _ => None
    }
    if (parsed.isEmpty || parsed.exists(_.isEmpty)) None else Some(parsed.map(_.get).toSeq)
  }

  private val EqRe = """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*('(?:[^']|'')*'|-?[0-9.]+)\s*$""".r
  private val InRe = """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s+IN\s*\((.*)\)\s*$""".r
  private val BareInRe = """(?is)^\s*IN\s*\((.*)\)\s*$""".r
  private val BetweenRe =
    """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s+BETWEEN\s+('(?:[^']|'')*'|-?[0-9.]+)\s+AND\s+('(?:[^']|'')*'|-?[0-9.]+)\s*$""".r

  private def unquote(lit: String): String =
    if (lit.startsWith("'")) lit.substring(1, lit.length - 1).replace("''", "'") else lit

  private def firstIdent(c: String): Option[String] = {
    val m = """(?s)^\s*([A-Za-z_][A-Za-z0-9_]*)""".r.findFirstMatchIn(c)
    m.map(_.group(1).toUpperCase(java.util.Locale.US))
  }

  /**
   * Decide the scan strategy for `cql` given the available secondary
   * layouts. `indexedAttrs` = attributes with an attribute-index
   * layout; `hasIdIndex` = the id layout exists for `idColumn`.
   */
  def decide(cql: String, idColumn: String, indexedAttrs: Set[String],
             hasIdIndex: Boolean, dtgColumn: Option[String] = Some("dtg"),
             cardinality: Map[String, String] = Map.empty): Decision = {
    // the reference's cardinality hint (AttributeFilterStrategy.scala:
    // 73-75, from the `cardinality=high|low` attribute option): a
    // high-cardinality attribute costs a tenth, low ten times
    def attrCost(attr: String, base: Long): Long =
      cardinality.get(attr).map(_.toLowerCase(java.util.Locale.US)) match {
        case Some("high") => base / 10
        case Some("low") => base * 10
        case _ => base
      }
    // classification looks through one level of parens; the residual is
    // rebuilt from the RAW substrings, re-parenthesized, so an OR group
    // can never change precedence against AND ("a OR b AND c" trap)
    val raw = Cql.splitAnd(cql)
    val conjuncts = raw.map(unwrap)

    // (strategy, cost) offered by conjunct i, per the static model; an
    // unparseable or empty IN list offers nothing (the whole filter
    // then evaluates on the fallback scan instead)
    def listOffer(vals: String, cost: Long)(mk: Seq[String] => Strategy): Option[(Strategy, Long)] =
      literals(vals).map(vs => (mk(vs), cost))
    def offer(c: String): Option[(Strategy, Long)] = c match {
      case BareInRe(vals) if hasIdIndex =>
        listOffer(vals, 1L)(IdLookup.apply)
      case InRe(name, vals) if name == idColumn && hasIdIndex =>
        listOffer(vals, 1L)(IdLookup.apply)
      case EqRe(name, v) if name == idColumn && hasIdIndex =>
        Some((IdLookup(Seq(unquote(v))), 1L))
      case InRe(name, vals) if indexedAttrs.contains(name) =>
        listOffer(vals, attrCost(name, 100L))(AttrEquals(name, _))
      case EqRe(name, v) if indexedAttrs.contains(name) =>
        Some((AttrEquals(name, Seq(unquote(v))), attrCost(name, 100L)))
      case BetweenRe(name, lo, hi) if indexedAttrs.contains(name) =>
        Some((AttrRange(name, unquote(lo), unquote(hi)), attrCost(name, 250L)))
      case _ => None
    }

    val offers = conjuncts.zipWithIndex.flatMap { case (c, i) => offer(c).map((_, i)) }
    val spatial = conjuncts.exists(c => firstIdent(c).exists(SpatialOps.contains))
    val temporal = conjuncts.exists { c =>
      // `dtg DURING ...`: the operator is the SECOND token; BETWEEN is
      // temporal ONLY on the schema's dtg column (any attribute can
      // range-scan with BETWEEN)
      val toks = c.trim.split("\\s+")
      toks.length >= 2 && (TemporalOps.contains(toks(1).toUpperCase(java.util.Locale.US)) ||
        (toks(1).equalsIgnoreCase("BETWEEN") && dtgColumn.contains(toks(0))))
    }
    val zCost =
      if (spatial && temporal) 200L
      else if (spatial) 400L
      else if (temporal) 401L
      else Long.MaxValue

    offers.sortBy(_._1._2).headOption match {
      case Some(((strategy, cost), at)) if cost < zCost =>
        val rest = raw.zipWithIndex.collect { case (c, i) if i != at => s"($c)" }
        Decision(strategy, if (rest.isEmpty) None else Some(rest.mkString(" AND ")), cost)
      case _ =>
        Decision(ZScan, Some(cql), zCost)
    }
  }
}
