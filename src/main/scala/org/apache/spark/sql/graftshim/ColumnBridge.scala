package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made `ExpressionUtils` private[sql]; extension libraries that
  * define custom Catalyst expressions need exactly these two conversions,
  * so this shim lives in the org.apache.spark.sql namespace (the same
  * technique Spark-native extension projects use). No other internals
  * are touched.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Bounded-heap top-k aggregate (Spark's private[sql] CollectTopK):
    * keeps at most k items per group in the partial (map-side) buffer,
    * so a top-k never shuffles the full scored input. reverse=false
    * keeps the k LARGEST (eval() returns them sorted descending);
    * reverse=true keeps the k smallest (sorted ascending). */
  def collectTopK(item: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopKShim
        .collectTopK(ExpressionUtils.expression(item), k, reverse)
        .toAggregateExpression())
}
