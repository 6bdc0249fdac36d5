package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression converters,
  * needed to expose graft's native Catalyst expressions (graft.expressions)
  * as plain Columns without per-session function registration. This is the
  * established pattern for pre-registered extension libraries; nothing else
  * in this package is touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Wrap an analyzed logical plan back into a DataFrame — used by the
    * scale lint to measure a Window node's per-partition row counts by
    * re-querying its child plan (diagnostics only, never a data path). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
