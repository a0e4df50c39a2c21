package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Shared shape for the native vector kernels: a binary expression over
  * float/double arrays returning a double, with a codegen'd ascending
  * per-element loop. The IEEE op order (left fold from 0.0, index
  * ascending) is identical to the `aggregate(zip_with(...))` portable
  * forms in [[Vec]] and to DuckDB's `list_sum(list_transform(...))`, so
  * swapping a portable site for the native kernel cannot move a hash
  * gate.
  *
  * Why these exist (round 11): higher-order functions (`aggregate`,
  * `zip_with`) have NO doGenCode — inside an otherwise codegen'd stage
  * they fall back to per-row INTERPRETED eval with a per-element lambda
  * dispatch. ivfTrain's Lloyd assignment evaluates its L2 distance
  * 89.6M times at sf10 (200k vectors x 448 centroids); interpreted,
  * that single expression held the stage for minutes (jstack:
  * `ArrayAggregate.eval` / `BinaryArithmetic.eval` under
  * `SpecificUnsafeProjection`), where the native loop is ~64 fused
  * multiply-adds/row.
  */
abstract class VecFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def getter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(s"${prettyName} over $t")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects float/double arrays, got ${left.dataType}, ${right.dataType}")
  }

  protected final def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected final def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** dot(a, b) = sum_i a_i * b_i — the codegen twin of [[Vec.dot]]. */
case class DotProduct(left: Expression, right: Expression)
    extends VecFoldExpression {

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = leftIsFloat; val yf = rightIsFloat
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $a.${getter(left)}($i) * (double) $b.${getter(right)}($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
}

/** l2sq(a, b) = sum_i (a_i - b_i)^2 — the codegen twin of the Lloyd
  * assignment's `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)))`.
  */
case class L2Squared(left: Expression, right: Expression)
    extends VecFoldExpression {

  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = leftIsFloat; val yf = rightIsFloat
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = (double) $a.${getter(left)}($i) - (double) $b.${getter(right)}($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Squared {
  def apply(a: Column, b: Column): Column =
    bridge.column(L2Squared(bridge.expression(a), bridge.expression(b)))
}
