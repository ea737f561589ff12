package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql package for constructing `Column`s from raw
  * Catalyst expressions (the classic converter is `private[sql]`) —
  * the standard extension-library pattern for custom aggregates that
  * are Expressions rather than encoder-based `Aggregator`s. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
  def aggColumn(f: AggregateFunction): Column =
    ExpressionUtils.column(f.toAggregateExpression(isDistinct = false))
}
