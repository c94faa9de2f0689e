package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4.x's `private[sql]` Column constructor so graft can
  * expose custom Catalyst `Expression`s as user-facing `Column`s.
  * (Spark 4 removed the public `new Column(expr)` constructor; the classic
  * path is `org.apache.spark.sql.classic.ExpressionUtils.column`.)
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
