package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import graft.cells.Cells

/**
 * Native Catalyst expressions for the hot cell kernels (SURVEY.md §7.3:
 * the reference registers everything as ScalaUDF, which boxes arguments
 * and blocks null short-circuiting; a first-class Expression with
 * doGenCode stays inside WholeStageCodegen with primitive locals).
 *
 * `CellOfXY(lon, lat, res)` -> packed cell id, identical to
 * Cells.cell / the st_cellOfXY UDF (parity asserted in spec).
 * Registered as SQL function `st_cell_native` via
 * GraftExtensions.injectFunction.
 */
case class CellOfXY(lon: Expression, lat: Expression, res: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(lon, lat, res)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = lon.dataType == DoubleType && lat.dataType == DoubleType &&
      res.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"st_cell_native expects (double, double, int), got " +
        s"(${lon.dataType.simpleString}, ${lat.dataType.simpleString}, ${res.dataType.simpleString})")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val lo = lon.eval(input)
    val la = lat.eval(input)
    val r = res.eval(input)
    if (lo == null || la == null || r == null) null
    else Cells.cell(lo.asInstanceOf[Double], la.asInstanceOf[Double], r.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loGen = lon.genCode(ctx)
    val laGen = lat.genCode(ctx)
    val rGen = res.genCode(ctx)
    val cells = Cells.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${loGen.code}
        ${laGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = ${loGen.isNull} || ${laGen.isNull} || ${rGen.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = $cells.cell(${loGen.value}, ${laGen.value}, ${rGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(lon = newChildren(0), lat = newChildren(1), res = newChildren(2))
}

object CellOfXY {
  val info: ExpressionInfo = new ExpressionInfo(classOf[CellOfXY].getName, "st_cell_native")
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, "st_cell_native(lon, lat, res)")
    def to(e: Expression, dt: DataType): Expression =
      if (e.resolved && e.dataType == dt) e else Cast(e, dt)
    CellOfXY(to(args(0), DoubleType), to(args(1), DoubleType), to(args(2), IntegerType))
  }
}
