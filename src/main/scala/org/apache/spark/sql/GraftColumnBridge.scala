package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column<->Expression converters of the
  * classic (non-Connect) API, needed to expose custom Catalyst
  * expressions (graft.functions.NativeExpressions) as `Column`s on Spark
  * 4.x, where `new Column(expr)` no longer exists publicly.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
