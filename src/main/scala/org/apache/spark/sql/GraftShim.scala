package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's Catalyst `Expression`s and the public
  * `Column` API. Spark 4 routes Column↔Expression conversion through
  * `classic.ExpressionUtils`, which is `private[sql]` at the Scala
  * level — this shim re-exports just the two conversions. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Converts a Column composition to a plain Catalyst tree
    * (UnresolvedFunction nodes the analyzer resolves), unlike
    * [[expression]] whose lazy ColumnNodeExpression wrapper is
    * Unevaluable when returned from a FunctionRegistry builder. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The session's function registry, for registering graft's SQL
    * functions into an already-built session (the extensions path
    * covers sessions built with `withExtensions`). */
  def functionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
