package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

package object expressions {
  /** Spark 4 moved Column↔Expression bridging behind the classic shim. */
  def toExpr(c: Column): Expression = org.apache.spark.sql.graft.Bridge.toExpr(c)
  def toCol(e: Expression): Column = org.apache.spark.sql.graft.Bridge.toCol(e)
}
