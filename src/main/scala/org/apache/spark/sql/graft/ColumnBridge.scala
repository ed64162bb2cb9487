package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column independent of catalyst Expressions; the adapter
  * (`classic.ExpressionUtils`) is private[sql], so extension libraries
  * expose it through a shim in the sql package namespace — the standard
  * pattern for Column <-> Expression bridging in Spark 4 extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
