package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for Spark's `private[aggregate]` CollectTopK — the bounded-heap
  * top-k aggregate (map-side partial buffer capped at k items per group).
  * Same namespace-shim technique as graftshim.ColumnBridge; nothing else
  * in the package is touched. */
object GraftTopKShim {
  def collectTopK(child: Expression, k: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, k, reverse)
}
