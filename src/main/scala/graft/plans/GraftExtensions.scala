package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Catalyst extensions — the engine's analog of the reference's injected
 * optimizations (geomesa-spark-sql SQLRules.scala:294-305 and
 * geomesa-spark-jts GeometryLiteralRules.scala:21-39):
 *
 *  - GeometryLiteralFolding: a deterministic spatial ScalaUDF whose
 *    children are all foldable is evaluated once at plan time and
 *    replaced by a Literal (Catalyst's ConstantFolding refuses ScalaUDF
 *    because `foldable=false`, same gap the reference closes).
 *  - SpatialJoinRewrite: `Join(l, r, on st_intersects/contains/within
 *    (lgeom, rgeom))` becomes cover-cell explodes on both sides + a cell
 *    equi-join + the original exact predicate + reference-point
 *    ownership dedup — turning a would-be CartesianProduct (BNLJ) into
 *    a shuffled/broadcast hash join on the cell key.
 *
 * Enable with:
 *   SparkSession.builder.withExtensions(GraftExtensions.inject) or
 *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.inject(ext)
}

object GraftExtensions {

  val inject: SparkSessionExtensions => Unit = { ext =>
    ext.injectOptimizerRule(_ => GeometryLiteralFolding)
    ext.injectOptimizerRule(_ => SpatialFilterRule)
    ext.injectOptimizerRule(_ => SpatialJoinRewrite)
    // native codegen cell expression (st_cell_native) — primitive-typed,
    // whole-stage-codegen, unlike the boxed ScalaUDF surface
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("st_cell_native"),
      graft.functions.CellOfXY.info,
      graft.functions.CellOfXY.builder))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("st_intersects_native"),
      graft.functions.IntersectsWkb.info,
      graft.functions.IntersectsWkb.builder))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("st_env_cover_native"),
      graft.functions.EnvCoverWkb.info,
      graft.functions.EnvCoverWkb.builder))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("st_owner_cell_native"),
      graft.functions.OwnerCellWkb.info,
      graft.functions.OwnerCellWkb.builder))
  }

  /** Join resolution for the rewrite's cover cells (knob-free default:
    * ~2.8 degree cells; fine enough to cut candidates, coarse enough to
    * bound the per-row explode). */
  val JoinRes = 7
  val MaxCoverCells = 64

  private[plans] def isSpatialName(n: String): Boolean =
    Set("st_intersects", "st_contains", "st_within", "st_covers", "st_overlaps")
      .contains(n.toLowerCase)
}

/** Plan-time evaluation of constant spatial UDF calls. */
object GeometryLiteralFolding extends Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s: ScalaUDF
        if s.udfName.exists(_.toLowerCase.startsWith("st_")) && s.deterministic &&
          s.children.nonEmpty && s.children.forall(_.foldable) =>
      val v = s.eval(null)
      Literal.create(v, s.dataType)
  }
}

/** θ-spatial-join -> cell equi-join rewrite (with size split: oversized
  * geometries take an exact-predicate broadcast branch — see
  * SpatialJoin's scaladoc for why covers must never coarsen inside an
  * equi-join). */
object SpatialJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && hint == JoinHint.NONE &&
          !hasEquiKeys(cond, left, right) &&
          findSpatialPred(cond, left, right).isDefined &&
          !left.output.exists(_.name == "__graft_lcell") =>
      val info = findSpatialPred(cond, left, right).get
      val SpatialPredInfo(lg, rg, radius, planar, pred) = info
      val res = GraftExtensions.JoinRes
      val maxCells = Literal(GraftExtensions.MaxCoverCells)
      val rad = Literal(radius)
      val pl = Literal(planar)
      // fused native routing expression (graft.functions.CoverHugeWkb):
      // ONE WKB parse per evaluation emits (huge flag, envelope cover).
      // The distance expansion (dwithin) applies to the RIGHT side only:
      // the pair then meets at a cell of env(l) intersect expandedEnv(r).
      def chOfL(g: Expression) = graft.functions.CoverHugeWkb(
        g, Literal(res), maxCells, Literal(0.0), Literal(false))
      def chOfR(g: Expression) = graft.functions.CoverHugeWkb(
        g, Literal(res), maxCells, rad, pl)
      def hugeOfL(g: Expression) = GetStructField(chOfL(g), 0, Some("huge"))
      def hugeOfR(g: Expression) = GetStructField(chOfR(g), 0, Some("huge"))
      val outAttrs = left.output ++ right.output

      // grid refine: when the user predicate is plain st_intersects, swap
      // the boxed ScalaUDF for the native prepared-geometry expression —
      // prep side = the repeated/broadcast side of each branch
      def refined(prepRight: Boolean): Expression =
        if (!pred.udfName.exists(_.equalsIgnoreCase("st_intersects"))) cond
        else splitConjuncts(cond).map { c =>
          if (c fastEquals pred) {
            if (prepRight) graft.functions.IntersectsWkb(lg, rg): Expression
            else graft.functions.IntersectsWkb(rg, lg): Expression
          } else c
        }.reduce(And)

      // grid branch through the cell equi-join: a huge row's fused cover
      // is EMPTY, so the non-outer Generate drops it with no extra filter
      val lCell = AttributeReference("__graft_lcell", LongType, nullable = true)()
      val rCell = AttributeReference("__graft_rcell", LongType, nullable = true)()
      val genL = Generate(Explode(GetStructField(chOfL(lg), 1, Some("cells"))),
        Nil, outer = false, None, Seq(lCell), left)
      val genR = Generate(Explode(GetStructField(chOfR(rg), 1, Some("cells"))),
        Nil, outer = false, None, Seq(rCell), right)
      val owner = graft.functions.OwnerCellExpWkb(lg, rg, Literal(res), rad, pl)
      val newCond = And(And(EqualTo(lCell, rCell), refined(prepRight = true)), EqualTo(lCell, owner))
      val grid = Project(outAttrs, Join(genL, genR, Inner, Some(newCond), hint))

      // huge branches: exact-predicate joins with the rare oversized rows
      // broadcast (BNLJ). The BROADCAST hint doubles as the idempotency
      // guard — this rule skips hinted joins. With AQE, empty huge sides
      // collapse the branch via empty-relation propagation.
      val bcRight = JoinHint(None, Some(HintInfo(Some(BROADCAST))))
      val bcLeft = JoinHint(Some(HintInfo(Some(BROADCAST))), None)
      val hugeR = Project(outAttrs,
        Join(left, Filter(hugeOfR(rg), right), Inner, Some(refined(prepRight = true)), bcRight))
      val hugeLvsSmallR = Project(outAttrs,
        Join(Filter(hugeOfL(lg), left), Filter(Not(hugeOfR(rg)), right), Inner,
          Some(refined(prepRight = false)), bcLeft))
      Union(Seq(grid, hugeR, hugeLvsSmallR))
  }

  private[plans] case class SpatialPredInfo(
    leftGeom: Expression, rightGeom: Expression, radius: Double, planar: Boolean,
    pred: ScalaUDF)

  /** Extract the spatial predicate when the whole condition (or a
    * top-level conjunct) is a recognized spatial ScalaUDF with one side
    * per join child — binary predicates (st_intersects family) or
    * st_dwithin/st_dwithinPlanar with a foldable distance. */
  private def findSpatialPred(cond: Expression, left: LogicalPlan, right: LogicalPlan): Option[SpatialPredInfo] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] = {
      val aRefs = a.references
      val bRefs = b.references
      if (aRefs.subsetOf(left.outputSet) && bRefs.subsetOf(right.outputSet) &&
        aRefs.nonEmpty && bRefs.nonEmpty) Some((a, b))
      else if (aRefs.subsetOf(right.outputSet) && bRefs.subsetOf(left.outputSet) &&
        aRefs.nonEmpty && bRefs.nonEmpty) Some((b, a))
      else None
    }
    val conjuncts = splitConjuncts(cond)
    conjuncts.iterator.flatMap {
      case s: ScalaUDF if s.udfName.exists(GraftExtensions.isSpatialName) && s.children.size == 2 =>
        val Seq(a, b) = s.children
        sides(a, b).map { case (l, r) => SpatialPredInfo(l, r, 0.0, planar = false, s) }
      case s: ScalaUDF if s.children.size == 3 &&
          s.udfName.exists(n => n.equalsIgnoreCase("st_dwithin") ||
            n.equalsIgnoreCase("st_dwithinPlanar")) && s.children(2).foldable =>
        val Seq(a, b, d) = s.children
        val planar = s.udfName.exists(_.equalsIgnoreCase("st_dwithinPlanar"))
        val radius = Option(d.eval(null)).map {
          case x: Double => x
          case x: java.lang.Number => x.doubleValue()
        }
        radius match {
          case Some(r) if r > 0 =>
            sides(a, b).map { case (l, rr) => SpatialPredInfo(l, rr, r, planar, s) }
          case _ => None
        }
      case _ => None
    }.nextOption()
  }

  /** A join that already has an equi-key (e.g. our own cell join, or any
    * hash-joinable condition) is left alone — the rewrite only exists to
    * kill cartesian/BNLJ plans. Also keeps the rule idempotent. */
  private def hasEquiKeys(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
            a.references.nonEmpty && b.references.nonEmpty)
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
