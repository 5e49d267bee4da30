package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 hides Column <-> Expression bridging behind private[sql]
  * (classic.ExpressionUtils); this one-file bridge exposes exactly those
  * two conversions to graft.plans.GraftExpressions. No Spark internals
  * are modified or shadowed.
  */
object GraftColumnBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
