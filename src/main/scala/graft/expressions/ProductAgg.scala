package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Product aggregate (skip-null, identity 1 on empty input).
  *
  * The reference exposes `prod` as a reduction with identity 1 and skipna
  * semantics (reference fletcher/_algorithms.py:170, base.py:506-507); Spark
  * has no built-in product. Implemented as a `DeclarativeAggregate` — pure
  * expressions, so it whole-stage-codegens and supports partial aggregation
  * (map-side combine) → merge, exactly what a 1000-executor plan needs.
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "product_agg"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  private lazy val prod = AttributeReference("prod", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(1.0))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), prod, Multiply(prod, child)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Multiply(prod.left, prod.right))
  override lazy val evaluateExpression: Expression = prod

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}

object ProductAgg {
  /** Column-API entry: `prodAgg($"x")` — null-skipping product, identity 1. */
  def prodAgg(c: Column): Column =
    toCol(ProductAgg(Cast(toExpr(c), DoubleType)).toAggregateExpression())
}
