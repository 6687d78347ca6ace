package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made the direct
  * `new Column(expr)` constructor internal (Column now wraps a
  * ColumnNode); ExpressionUtils is the blessed conversion but is
  * private[sql], so this one-liner lives in the sql package
  * namespace — the conventional shim for Catalyst-extending
  * libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
