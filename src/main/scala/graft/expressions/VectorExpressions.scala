package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the similarity/ANN hot paths (r19
  * optimization round). Each is a drop-in replacement for a higher-order-
  * function fold whose per-element interpreted evaluation dominated the
  * operator's CPU (HOFs are CodegenFallback); the arithmetic is the
  * bit-identical sequential fold — see [[VectorKernels]] for the contract.
  * Same discipline as [[TextCount]] et al.: every expression ships
  * `doGenCode` as one static call into a kernel class so it stays inside
  * whole-stage codegen.
  */

/** Sequential-fold dot product of two array&lt;double&gt; columns. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""java.lang.Double $r = graft.expressions.VectorKernels.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sequential-fold squared L2 distance of two array&lt;double&gt; columns. */
case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("l2Res")
      s"""java.lang.Double $r = graft.expressions.VectorKernels.l2sq($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** PQ codes of an array&lt;double&gt; vector against driver-held codebooks
  * (array[m][k][subDim]); the codebooks ride as a codegen reference object,
  * so the generated source — unlike the unrolled fold it replaces — is
  * independent of m, k, AND the codebook values (Lloyd rounds update the
  * values every iteration; value-independent source keeps the codegen
  * cache hot across rounds). */
case class PqEncode(child: Expression, cbs: Array[Array[Array[Double]]],
    subDim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqEncode(v.asInstanceOf[ArrayData], cbs, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cbs, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VectorKernels.pqEncode($v, $ref, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
