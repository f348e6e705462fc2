package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4
  * classic (`org.apache.spark.sql.classic.ExpressionUtils`) so graft's custom
  * Catalyst expressions can be exposed as `Column`s. Lives under
  * `org.apache.spark.sql` for access; contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
