package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Envelope
import graft.cells.Cells
import graft.geom.GeomOps

/**
 * Automatic spatial-filter pushdown — the Catalyst analog of the
 * reference's injected relation rewrite (geomesa-spark-sql
 * SQLRules.scala:223-262 + FilterHelper.scala:201-310, which turn
 * `Filter(st_intersects(geom, literal))` into index ranges).
 *
 * A plain SQL `WHERE st_intersects(st_makePoint(lon, lat), <literal>)`
 * is a black-box ScalaUDF to Spark: nothing pushes into the Parquet
 * scan and the whole table is read. This rule derives sound (superset)
 * conjuncts from the literal geometry's envelope and AND-s them onto
 * the filter, where Catalyst's normal machinery takes over:
 *
 *  - `lon/lat BETWEEN <envelope bounds>` when the row geometry is an
 *    `st_makePoint(lonExpr, latExpr)` shape — these are plain attribute
 *    comparisons, so they reach the scan (PushedFilters: row-group
 *    skipping) and prune partitions when lon/lat partition the table;
 *  - `cell_prefix` envelope check (deterministic UDF on the partition
 *    column — evaluated driver-side against partition VALUES, pruning
 *    SpatialTable's cell_prefix=... directories; res-agnostic because
 *    the packed id carries its resolution);
 *  - `cell BETWEEN <z-range>` ORs at the resolution given by the
 *    session conf `spark.graft.index.res` (SpatialTable's layout sorts
 *    files by cell, so these skip Parquet row groups). Only added when
 *    the conf is set — the rule cannot know a foreign table's packed
 *    resolution, and ranges at the wrong res would wrongly filter.
 *
 * The original exact predicate stays: the envelope conjuncts are pure
 * over-approximation (any geometry satisfying the predicate against the
 * literal lies inside/touches the literal's envelope; st_dwithin
 * expands the envelope by a conservative metric->degree conversion).
 * The rule is fixpoint-safe: derived conjuncts that are already present
 * (semanticEquals) are not re-added.
 */
object SpatialFilterRule extends Rule[LogicalPlan] {

  /** pred(a, b) shapes where a true result implies the row geometry
    * intersects the literal's envelope (either argument order). Shared
    * with table.PartitionScheme's filter-to-partition cover. */
  private[graft] val Pushable = Set("st_intersects", "st_contains", "st_within",
    "st_covers", "st_overlaps", "st_crosses", "st_touches", "st_equals")

  /** Shared function VAL (not a per-rewrite lambda) so repeated rule
    * applications build semanticEquals-identical ScalaUDFs — the
    * fixpoint-termination requirement. */
  private[plans] val prefixIntersectsFn: (Long, Double, Double, Double, Double) => Boolean =
    (prefix, lo, loY, hi, hiY) => {
      // Self-guarding: a value whose top 6 bits are not a valid packed
      // resolution is not a graft cell id — never prune on it.
      if ((prefix >>> 58) > Cells.MaxRes) true
      else {
        val (x0, y0, x1, y1) = Cells.envelope(prefix)
        x1 >= lo && x0 <= hi && y1 >= loY && y0 <= hiY
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if f.resolved =>
      val conjuncts = splitConjuncts(cond)
      val extra = conjuncts.flatMap(c => derive(c, child))
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Evaluate a constant geometry expression to its JTS envelope (the
    * literal side after GeometryLiteralFolding, or any deterministic
    * reference-free expression). Shared with table.PartitionScheme. */
  private[graft] def constEnvelope(e: Expression): Option[Envelope] = {
    if (!e.deterministic || e.references.nonEmpty || e.dataType != BinaryType) None
    else {
      try {
        e.eval(null) match {
          case b: Array[Byte] => Option(GeomOps.fromWkb(b)).map(_.getEnvelopeInternal)
          case _ => None
        }
      } catch { case _: Exception => None }
    }
  }

  /** Top-level conjunct -> derived conjuncts. An OR tree whose every
    * branch derives bounds composes as the OR of the branch bounds
    * (the disjoint-OR/multi-geometry query shape: `st_intersects(p, A)
    * OR st_intersects(p, B)` still prunes to env(A) ∪ env(B)). */
  private def derive(c: Expression, child: LogicalPlan): Seq[Expression] = c match {
    case Or(a, b) =>
      val left = derive(a, child)
      val right = derive(b, child)
      // sound only if BOTH branches constrain: a row satisfying the
      // un-derivable branch must not be filtered
      if (left.isEmpty || right.isEmpty) Nil
      else Seq(Or(left.reduce(And), right.reduce(And)))
    case other => deriveLeaf(other, child)
  }

  private def deriveLeaf(c: Expression, child: LogicalPlan): Seq[Expression] = c match {
    case s: ScalaUDF if s.children.size == 2 &&
        s.udfName.exists(n => Pushable(n.toLowerCase)) =>
      val Seq(a, b) = s.children
      (constEnvelope(a), constEnvelope(b)) match {
        case (Some(env), None) if b.references.subsetOf(child.outputSet) =>
          preds(b, env, child)
        case (None, Some(env)) if a.references.subsetOf(child.outputSet) =>
          preds(a, env, child)
        case _ => Nil
      }
    case s: ScalaUDF if s.children.size == 3 &&
        s.udfName.exists(n => n.equalsIgnoreCase("st_dwithin") ||
          n.equalsIgnoreCase("st_dwithinPlanar")) =>
      val Seq(a, b, d) = s.children
      val planar = s.udfName.exists(_.equalsIgnoreCase("st_dwithinPlanar"))
      val dist = if (d.foldable) Option(d.eval(null)).map {
        case x: Double => x
        case x: java.lang.Number => x.doubleValue()
      } else None
      dist match {
        case Some(radius) =>
          def expand(env: Envelope) =
            if (planar) GeomOps.expandEnvelopeDeg(env, radius)
            else GeomOps.expandEnvelopeMeters(env, radius)
          (constEnvelope(a), constEnvelope(b)) match {
            case (Some(env), None) if b.references.subsetOf(child.outputSet) =>
              preds(b, expand(env), child)
            case (None, Some(env)) if a.references.subsetOf(child.outputSet) =>
              preds(a, expand(env), child)
            case _ => Nil
          }
        case None => Nil
      }
    case _ => Nil
  }

  /** Derived conjuncts for a row-side geometry expression vs a query
    * envelope. */
  private def preds(rowGeom: Expression, env: Envelope, child: LogicalPlan): Seq[Expression] = {
    // Spark wraps scala UDFs in a null-propagation If and marks inputs
    // KnownNotNull — unwrap both (structurally, NOT collect: a point
    // buried inside another function would not bound the geometry)
    def unwrap(e: Expression): Expression = e match {
      case If(_, Literal(null, _), elseBranch) => unwrap(elseBranch)
      case KnownNotNull(x) => unwrap(x)
      case _ => e
    }
    val pointArgs: Option[(Expression, Expression)] = unwrap(rowGeom) match {
      case p: ScalaUDF if p.udfName.exists(_.equalsIgnoreCase("st_makePoint")) &&
          p.children.size == 2 =>
        Some((unwrap(p.children(0)), unwrap(p.children(1))))
      case _ => None
    }
    val coordBounds: Seq[Expression] = pointArgs.toSeq.flatMap { case (lonE, latE) =>
      Seq(
        GreaterThanOrEqual(lonE, Literal(env.getMinX)),
        LessThanOrEqual(lonE, Literal(env.getMaxX)),
        GreaterThanOrEqual(latE, Literal(env.getMinY)),
        LessThanOrEqual(latE, Literal(env.getMaxY)))
    }

    // SOUNDNESS GATE for the index-column predicates: `cell`/`cell_prefix`
    // describe the table's INDEXED point (SpatialTable writes them from
    // its lonCol/latCol). They may only constrain a query whose geometry
    // IS that point — i.e. st_makePoint over attributes with the
    // configured index coordinate names (`spark.graft.index.lonCol` /
    // `latCol`, default lon/lat). A predicate over some other stored
    // geometry (a polygon column, a second coordinate pair) must not be
    // pruned by the point index: the row's polygon can intersect the
    // query while its indexed point lies outside it.
    val lonName = conf.getConfString("spark.graft.index.lonCol", "lon")
    val latName = conf.getConfString("spark.graft.index.latCol", "lat")
    val isIndexedPoint = pointArgs.exists {
      case (lonE, latE) =>
        def attrName(e: Expression): Option[String] = e match {
          case a: Attribute => Some(a.name)
          case Cast(a: Attribute, _, _, _) => Some(a.name)
          case _ => None
        }
        attrName(lonE).contains(lonName) && attrName(latE).contains(latName)
    }
    if (!isIndexedPoint) return coordBounds

    // SpatialTable layout columns (cell indexes the row's point; see
    // table/SpatialTable.scala:48-66)
    val prefixPred: Seq[Expression] =
      child.output.find(a => a.name == "cell_prefix" && a.dataType == LongType).map { attr =>
        ScalaUDF(SpatialFilterRule.prefixIntersectsFn, BooleanType,
          Seq(attr, Literal(env.getMinX), Literal(env.getMinY),
            Literal(env.getMaxX), Literal(env.getMaxY)),
          Nil, None, Some("graft_prefix_prune"), nullable = false,
          udfDeterministic = true): Expression
      }.toSeq

    val cellPred: Seq[Expression] = {
      val resConf = conf.getConfString("spark.graft.index.res", "")
      if (resConf.isEmpty) Nil
      else child.output.find(a => a.name == "cell" && a.dataType == LongType).toSeq.flatMap { attr =>
        val res = resConf.toInt
        val ranges = ZQuery.cellRanges(
          (env.getMinX, env.getMinY, env.getMaxX, env.getMaxY), res, maxRanges = 32)
        // Self-guarding against a res mismatch between the session conf
        // and the table's packed cells (the conf is session-global; a
        // second table written at a different res must not be emptied by
        // ranges built at the wrong res-base). All res-R ids live in the
        // contiguous band [R<<58, (R+1)<<58): OR in "cell outside the
        // band" escapes — plain literal comparisons, so the whole
        // disjunction stays Parquet-pushable, and for a correctly-packed
        // table the escapes are false per row group and pruning is
        // decided by the range disjuncts alone.
        val bandLo = res.toLong << 58
        val bandHi = (res.toLong + 1) << 58 // exclusive; res<=29 so no overflow
        val escape: Seq[Expression] = Seq(
          LessThan(attr, Literal(bandLo)),
          GreaterThanOrEqual(attr, Literal(bandHi)))
        ranges.map(r => And(
            GreaterThanOrEqual(attr, Literal(r.lower)),
            LessThanOrEqual(attr, Literal(r.upper))): Expression)
          .reduceOption(Or)
          .map(rangeOr => (escape :+ rangeOr).reduce(Or))
          .toSeq
      }
    }

    coordBounds ++ prefixPred ++ cellPred
  }
}
