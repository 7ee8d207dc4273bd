package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression converters of the classic API
  * (Spark 4 hid these behind ColumnNode). Standard extension-project pattern —
  * only public-in-bytecode members are touched. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def sameTypeIgnoreNullability(a: types.DataType, b: types.DataType): Boolean =
    types.DataType.equalsIgnoreNullability(a, b)
}
