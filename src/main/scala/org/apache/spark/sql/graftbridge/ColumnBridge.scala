package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column onto column-nodes and made the
  * Expression⇄Column bridge `private[sql]`; this is the standard
  * extension-library shim (lives under org.apache.spark.sql.* to reach
  * ExpressionUtils) exposing the two conversions the engine's native
  * expressions need. Public Spark source API — no behavior added.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
