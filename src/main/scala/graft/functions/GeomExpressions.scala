package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import graft.cells.Cells
import graft.geom.GeomCache

/**
 * Native Catalyst expressions for the WKB join hot path (the
 * CellExpressions pattern extended per SURVEY.md §7.3): the refine
 * predicate and the envelope cover run once per candidate pair /
 * input row, and the ScalaUDF wrapper's boxing + function-object
 * dispatch + CatalystTypeConverters were measurable there. These stay
 * inside WholeStageCodegen with primitive locals and call the same
 * static kernels (bit-parity with the UDF twins asserted in spec).
 */
object GeomKernels {
  /** prepared-geometry cached intersects: right side is the (broadcast)
    * repeated side, so its edge index is reused across the partition. */
  def intersects(l: Array[Byte], r: Array[Byte]): Boolean =
    GeomCache.prep(r).intersects(GeomCache.geom(l))

  /** envelope cover of a WKB geometry at `res` (no refinement — the
    * ownership-dedup soundness requirement, see SpatialJoin.envCover). */
  def envCover(wkb: Array[Byte], res: Int, maxCells: Int): GenericArrayData = {
    val env = GeomCache.geom(wkb).getEnvelopeInternal
    new GenericArrayData(
      Cells.coverBBox(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, res, maxCells))
  }

  /** reference-corner owner cell of an envelope-intersection. */
  def ownerCell(a: Array[Byte], b: Array[Byte], res: Int): Long = {
    val ea = GeomCache.geom(a).getEnvelopeInternal
    val eb = GeomCache.geom(b).getEnvelopeInternal
    Cells.cell(math.max(ea.getMinX, eb.getMinX), math.max(ea.getMinY, eb.getMinY), res)
  }

  private val EmptyCells =
    new GenericArrayData(Array.empty[Long])

  private def expand(env: org.locationtech.jts.geom.Envelope, radius: Double,
                     planar: Boolean): org.locationtech.jts.geom.Envelope =
    if (radius <= 0) env
    else if (planar) graft.geom.GeomOps.expandEnvelopeDeg(env, radius)
    else graft.geom.GeomOps.expandEnvelopeMeters(env, radius)

  /**
   * The fused join-routing kernel: WKB parsed ONCE per evaluation ->
   * (huge flag, envelope cover cells) struct, with the dwithin distance
   * expansion applied first when radius > 0. A huge row (cover budget
   * exceeded at `res`) gets (true, []) — so the grid branch's explode
   * drops it with NO separate isHuge filter, and the huge branches
   * filter on the flag. Null WKB -> (false, []): dropped by the explode,
   * never routed to a huge branch (the previous isHuge-UDF semantics).
   */
  def coverHuge(wkb: Array[Byte], res: Int, maxCells: Int,
                radius: Double, planar: Boolean): InternalRow = {
    if (wkb == null) return new GenericInternalRow(Array[Any](false, EmptyCells))
    val env = expand(GeomCache.geom(wkb).getEnvelopeInternal, radius, planar)
    if (Cells.coverCountBBox(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, res) > maxCells)
      new GenericInternalRow(Array[Any](true, EmptyCells))
    else new GenericInternalRow(Array[Any](false, new GenericArrayData(
      Cells.coverBBox(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, res, maxCells))))
  }

  /** owner cell with the dwithin expansion on the RIGHT envelope. */
  def ownerCellExp(a: Array[Byte], b: Array[Byte], res: Int,
                   radius: Double, planar: Boolean): Long = {
    val ea = GeomCache.geom(a).getEnvelopeInternal
    val eb = expand(GeomCache.geom(b).getEnvelopeInternal, radius, planar)
    Cells.cell(math.max(ea.getMinX, eb.getMinX), math.max(ea.getMinY, eb.getMinY), res)
  }

  /** XZ-rule adaptive resolution from the extent's max dimension. */
  def adaptiveRes(wkb: Array[Byte], minRes: Int, maxRes: Int): Int = {
    val env = GeomCache.geom(wkb).getEnvelopeInternal
    val maxDim = math.max(env.getWidth / 360.0, env.getHeight / 180.0)
    val r =
      if (maxDim <= 0) maxRes
      else math.floor(-math.log(maxDim) / math.log(2.0)).toInt
    math.max(minRes, math.min(maxRes, r))
  }
}

/** `st_intersects_native(lwkb, rwkb)` — prepared/cached JTS intersects. */
case class IntersectsWkb(left: Expression, right: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_intersects_native expects (binary, binary)")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input)
    if (l == null || r == null) null
    else GeomKernels.intersects(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx); val rGen = right.genCode(ctx)
    val k = GeomKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${lGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = ${lGen.isNull} || ${rGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $k.intersects(${lGen.value}, ${rGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object IntersectsWkb {
  val info: ExpressionInfo = new ExpressionInfo(classOf[IntersectsWkb].getName, "st_intersects_native")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "st_intersects_native(lgeom, rgeom)")
    IntersectsWkb(args(0), args(1))
  }
}

/** `st_env_cover_native(wkb, res, maxCells)` — envelope cover cells. */
case class EnvCoverWkb(geom: Expression, res: Expression, maxCells: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(geom, res, maxCells)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (geom.dataType == BinaryType && res.dataType == IntegerType && maxCells.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_env_cover_native expects (binary, int, int)")

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input); val r = res.eval(input); val m = maxCells.eval(input)
    if (g == null || r == null || m == null) null
    else GeomKernels.envCover(g.asInstanceOf[Array[Byte]], r.asInstanceOf[Int], m.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gGen = geom.genCode(ctx); val rGen = res.genCode(ctx); val mGen = maxCells.genCode(ctx)
    val k = GeomKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${gGen.code}
        ${rGen.code}
        ${mGen.code}
        boolean ${ev.isNull} = ${gGen.isNull} || ${rGen.isNull} || ${mGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $k.envCover(${gGen.value}, ${rGen.value}, ${mGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(geom = newChildren(0), res = newChildren(1), maxCells = newChildren(2))
}

object EnvCoverWkb {
  val info: ExpressionInfo = new ExpressionInfo(classOf[EnvCoverWkb].getName, "st_env_cover_native")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, "st_env_cover_native(geom, res, maxCells)")
    def toInt(e: Expression): Expression =
      if (e.resolved && e.dataType == IntegerType) e else Cast(e, IntegerType)
    EnvCoverWkb(args(0), toInt(args(1)), toInt(args(2)))
  }
}

/** `st_owner_cell_native(lwkb, rwkb, res)` — ownership-dedup corner cell. */
case class OwnerCellWkb(left: Expression, right: Expression, res: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(left, right, res)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType && res.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_owner_cell_native expects (binary, binary, int)")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input); val rr = res.eval(input)
    if (l == null || r == null || rr == null) null
    else GeomKernels.ownerCell(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], rr.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx); val rGen = right.genCode(ctx); val resGen = res.genCode(ctx)
    val k = GeomKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${lGen.code}
        ${rGen.code}
        ${resGen.code}
        boolean ${ev.isNull} = ${lGen.isNull} || ${rGen.isNull} || ${resGen.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = $k.ownerCell(${lGen.value}, ${rGen.value}, ${resGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1), res = newChildren(2))
}

object OwnerCellWkb {
  val info: ExpressionInfo = new ExpressionInfo(classOf[OwnerCellWkb].getName, "st_owner_cell_native")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, "st_owner_cell_native(lgeom, rgeom, res)")
    def toInt(e: Expression): Expression =
      if (e.resolved && e.dataType == IntegerType) e else Cast(e, IntegerType)
    OwnerCellWkb(args(0), args(1), toInt(args(2)))
  }
}

/** `st_cover_huge_native(wkb, res, maxCells, radius, planar)` — the fused
  * join-routing expression: one WKB parse emits (huge flag, cover cells).
  * Replaces the isHuge ScalaUDF + separate cover evaluation on the join
  * hot path (see GeomKernels.coverHuge for the semantics). */
case class CoverHugeWkb(geom: Expression, res: Expression, maxCells: Expression,
                        radius: Expression, planar: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(geom, res, maxCells, radius, planar)
  override def dataType: DataType = CoverHugeWkb.Schema
  override def nullable: Boolean = false // null geom -> (false, [])

  override def checkInputDataTypes(): TypeCheckResult =
    if (geom.dataType == BinaryType && res.dataType == IntegerType &&
      maxCells.dataType == IntegerType && radius.dataType == DoubleType &&
      planar.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "st_cover_huge_native expects (binary, int, int, double, boolean)")

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input)
    GeomKernels.coverHuge(
      if (g == null) null else g.asInstanceOf[Array[Byte]],
      res.eval(input).asInstanceOf[Int], maxCells.eval(input).asInstanceOf[Int],
      radius.eval(input).asInstanceOf[Double], planar.eval(input).asInstanceOf[Boolean])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = geom.genCode(ctx); val r = res.genCode(ctx); val m = maxCells.genCode(ctx)
    val rad = radius.genCode(ctx); val pl = planar.genCode(ctx)
    val k = GeomKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${g.code}
        ${r.code}
        ${m.code}
        ${rad.code}
        ${pl.code}
        boolean ${ev.isNull} = false;
        InternalRow ${ev.value} = $k.coverHuge(
          ${g.isNull} ? null : ${g.value}, ${r.value}, ${m.value}, ${rad.value}, ${pl.value});
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(geom = newChildren(0), res = newChildren(1), maxCells = newChildren(2),
      radius = newChildren(3), planar = newChildren(4))
}

object CoverHugeWkb {
  val Schema: StructType = StructType(Seq(
    StructField("huge", BooleanType, nullable = false),
    StructField("cells", ArrayType(LongType, containsNull = false), nullable = false)))
}

/** `st_owner_cell_exp_native` — owner cell with dwithin expansion on the
  * right envelope (the per-pair dedup key of the rewritten join). */
case class OwnerCellExpWkb(left: Expression, right: Expression, res: Expression,
                           radius: Expression, planar: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(left, right, res, radius, planar)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType &&
      res.dataType == IntegerType && radius.dataType == DoubleType &&
      planar.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "st_owner_cell_exp_native expects (binary, binary, int, double, boolean)")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input); val r = right.eval(input)
    if (l == null || r == null) null
    else GeomKernels.ownerCellExp(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]],
      res.eval(input).asInstanceOf[Int], radius.eval(input).asInstanceOf[Double],
      planar.eval(input).asInstanceOf[Boolean])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx); val r = right.genCode(ctx); val rr = res.genCode(ctx)
    val rad = radius.genCode(ctx); val pl = planar.genCode(ctx)
    val k = GeomKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        ${rr.code}
        ${rad.code}
        ${pl.code}
        boolean ${ev.isNull} = ${l.isNull} || ${r.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = $k.ownerCellExp(${l.value}, ${r.value}, ${rr.value}, ${rad.value}, ${pl.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1), res = newChildren(2),
      radius = newChildren(3), planar = newChildren(4))
}

/** `st_adaptive_res_native(wkb, minRes, maxRes)` — XZ-rule adaptive tile
  * resolution (TileAssign's routing predicate, UDF-free). */
case class AdaptiveResWkb(geom: Expression, minRes: Expression, maxRes: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(geom, minRes, maxRes)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = geom.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (geom.dataType == BinaryType && minRes.dataType == IntegerType &&
      maxRes.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_adaptive_res_native expects (binary, int, int)")

  override def eval(input: InternalRow): Any = {
    val g = geom.eval(input)
    if (g == null) null
    else GeomKernels.adaptiveRes(g.asInstanceOf[Array[Byte]],
      minRes.eval(input).asInstanceOf[Int], maxRes.eval(input).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = geom.genCode(ctx); val lo = minRes.genCode(ctx); val hi = maxRes.genCode(ctx)
    val k = GeomKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${g.code}
        ${lo.code}
        ${hi.code}
        boolean ${ev.isNull} = ${g.isNull};
        int ${ev.value} = -1;
        if (!${ev.isNull}) {
          ${ev.value} = $k.adaptiveRes(${g.value}, ${lo.value}, ${hi.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(geom = newChildren(0), minRes = newChildren(1), maxRes = newChildren(2))
}
