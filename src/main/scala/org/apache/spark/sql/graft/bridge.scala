package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge to the `private[sql]` Column↔Expression converters —
  * Spark 4 wraps Column around ColumnNode, so third-party Catalyst
  * expressions need this hop to surface as user-facing Columns.
  * (Same technique spark-avro and other first-party connectors use from
  * inside the sql package.)
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
