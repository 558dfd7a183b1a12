package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's Catalyst `Expression`s and the public
  * `Column` API. Spark 4 routes Column↔Expression conversion through
  * `classic.ExpressionUtils`, which is `private[sql]` at the Scala
  * level — this shim re-exports just the two conversions. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
