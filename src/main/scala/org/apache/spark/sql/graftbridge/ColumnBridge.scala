package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(Expression)` constructor; the
  * blessed conversion lives in `private[sql]` ExpressionUtils. This bridge
  * (in an `org.apache.spark.sql` subpackage, the standard extension
  * technique) exposes exactly the two conversions custom expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
