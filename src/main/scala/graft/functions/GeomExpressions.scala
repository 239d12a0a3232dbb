package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
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
