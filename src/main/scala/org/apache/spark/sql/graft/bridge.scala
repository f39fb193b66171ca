package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Column↔Expression bridging behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This is the one place
  * the library reaches into the sql package namespace — the standard pattern
  * for Catalyst-extension libraries.
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}
