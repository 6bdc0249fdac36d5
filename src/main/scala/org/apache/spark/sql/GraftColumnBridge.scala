package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression converters,
  * needed to expose graft's native Catalyst expressions (graft.expressions)
  * as plain Columns without per-session function registration. This is the
  * established pattern for pre-registered extension libraries; nothing else
  * in this package is touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
