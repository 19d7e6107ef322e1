package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to the `private[sql]` Column <-> Catalyst Expression
 * converters, the standard pattern for Spark extension libraries that
 * ship custom Expressions (Spark 4 moved `Column.expr` behind
 * `org.apache.spark.sql.classic.ExpressionUtils`). Nothing else from
 * the private surface is touched.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
