package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for Column <-> catalyst Expression, which Spark 4 keeps
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils). Needed to
  * expose custom native expressions (graft.ops.GeoExpressions) as Columns. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
