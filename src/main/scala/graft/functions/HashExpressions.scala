package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Java `String.hashCode` as a native codegen expression — the
 * deterministic per-row hash behind the HashAttribute process analog
 * (reference: geomesa-process-vector/.../transform/HashAttributeProcess
 * .scala:24-60, which buckets a stringified attribute with
 * `abs(hash) % modulo`). The reference uses Guava's goodFastHash, whose
 * seed changes per JVM launch — i.e. even the reference's own buckets
 * are not stable across runs — so the Spark-native analog standardizes
 * on String.hashCode: stable across runs/executors, cheap inside
 * WholeStageCodegen, and exactly replicable in ANSI SQL for the oracle
 * (OracleGen.jhash). NULL attribute hashes as "" (reference behavior:
 * `Option(...).getOrElse("")`), so the expression is non-nullable.
 */
case class JavaHashString(child: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false // null hashes as "" (hash 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("java_hash expects a string argument")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else v.asInstanceOf[UTF8String].toString.hashCode
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = false;
        int ${ev.value} = ${c.isNull} ? 0 : ${c.value}.toString().hashCode();
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
