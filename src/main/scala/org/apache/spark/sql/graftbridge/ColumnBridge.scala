package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4's Column holds a ColumnNode (Connect-compatible), not an
  * Expression; library code that defines native Catalyst expressions
  * needs these two hops. Lives under org.apache.spark.sql for access.
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
