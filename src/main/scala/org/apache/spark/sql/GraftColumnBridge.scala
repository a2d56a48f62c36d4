package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Catalyst-Expression converters.
  *
  * Spark 4 made `Column` backend-agnostic (it wraps a `ColumnNode`, not an
  * `Expression`), and the classic converters live behind `private[sql]`.
  * Libraries that ship custom Catalyst expressions need exactly two hooks —
  * wrap an `Expression` as a `Column` and unwrap a `Column` back — so this
  * object re-exports them from inside the package, the same pattern other
  * Spark-native extension libraries use.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
