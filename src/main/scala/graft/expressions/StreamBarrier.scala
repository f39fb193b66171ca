package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Evaluates `pred` with null-as-false, while also REFERENCING the
  * event-time column `ts` without using its value.
  *
  * Why this exists: a filter placed after `withWatermark` is only
  * syntactically above the watermark node. `PushPredicateThroughNonJoin`
  * splits the filter condition into conjuncts and pushes every conjunct
  * that does not reference the watermark column BELOW `EventTimeWatermark`
  * — so a side filter like `event_type = 'click'` silently moves under the
  * watermark node and freezes that side's watermark at the last KEPT row
  * (appending `AND ts IS NOT NULL` does not survive: the conjuncts are
  * split and pushed independently). For outer interval joins that freeze
  * means the final rows' outer results never emit ([[graft.streaming
  * .Streams.intervalJoin]]).
  *
  * As a single non-`And` predicate whose `references` include `ts`, this
  * expression is unsplittable and unpushable, pinning the filter above the
  * watermark node, where it sees the filtered stream while the watermark
  * sees everything. Codegen-friendly: delegates straight to the predicate's
  * generated code, so the filter stays inside whole-stage codegen.
  */
case class AboveWatermarkPredicate(pred: Expression, ts: Expression)
    extends Expression with Predicate {

  override def prettyName: String = "above_watermark"
  override def children: Seq[Expression] = Seq(pred, ts)
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType

  override def eval(input: InternalRow): Any = {
    val v = pred.eval(input)
    v != null && v.asInstanceOf[Boolean]
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val p = pred.genCode(ctx)
    ev.copy(
      code = code"""
        ${p.code}
        boolean ${ev.value} = !${p.isNull} && ${p.value};""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pred = newChildren(0), ts = newChildren(1))
}

object AboveWatermarkPredicate {
  /** `pinAboveWatermark(pred, tsCol)` — pred with null-as-false, kept above
    * the watermark node of the stream it filters. */
  def pinAboveWatermark(pred: Column, ts: Column): Column =
    toCol(AboveWatermarkPredicate(toExpr(pred), toExpr(ts)))
}
