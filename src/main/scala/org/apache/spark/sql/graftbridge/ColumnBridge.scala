package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Catalyst Expression bridge. Spark 4 removed the public
 * `new Column(expr)` constructor (Connect refactor); the classic
 * helper is `private[sql]`, so extension libraries expose it from a
 * package under org.apache.spark.sql — the established pattern for
 * Catalyst-native function libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
