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

/** Sign-bit LSH bucket id over one hyperplane table: bit p of the result
  * is set when dot(emb, planes[p]) >= 0, with each dot the SAME ascending
  * IEEE multiply-accumulate from 0.0 as [[DotProduct]] — so swapping the
  * per-plane `when(dot >= 0, 1<<p)` expression tree for this kernel
  * cannot move the s2/s5/d5/d11 hash gates.
  *
  * Why it exists (round 12): one bucket as a Catalyst tree is 16
  * DotProduct loops + 16 Whens + an Add chain, and the four-table corpus
  * bucketing projection inlines FOUR such trees into one generated
  * consume() — past HotSpot's huge-method bytecode threshold, so the
  * whole stage ran in the JVM bytecode interpreter. Measured at sf10
  * (200k vectors): 1-table materialization 1.8 s, 2-table 3.6 s, 4-table
  * 42-48 s (the JIT cliff, not data growth). One nested loop per table
  * with the plane matrix as a codegen reference object keeps the method
  * tiny and the stage JIT-compiled.
  */
case class SignBucket(child: Expression, planes: Array[Double],
    numPlanes: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  private def getter: String = child.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(s"sign_bucket over $t")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bucket expects a float/double array, got $t")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      // identical to DotProduct over min(|emb|, dim) elements
      val n = math.min(x.numElements(), dim)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val xi = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        dot += xi * planes(p * dim + i)
        i += 1
      }
      if (dot >= 0.0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $b = 0;
        int $n = java.lang.Math.min($a.numElements(), $dim);
        for (int $p = 0; $p < $numPlanes; $p++) {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += (double) $a.$getter($i) * $w[$p * $dim + $i];
          }
          if ($dot >= 0.0) $b |= (1 << $p);
        }
        ${ev.value} = $b;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBucket {
  /** `planes` is the (numPlanes × dim) hyperplane table, flattened
    * row-major into the codegen reference array.
    */
  def apply(planes: Array[Array[Double]], emb: Column): Column = {
    val np = planes.length
    val dim = planes.head.length
    val flat = new Array[Double](np * dim)
    var i = 0
    for (p <- 0 until np; j <- 0 until dim) { flat(i) = planes(p)(j); i += 1 }
    bridge.column(SignBucket(bridge.expression(emb), flat, np, dim))
  }
}

/** Argmin-L2 cell assignment against a baked-in coarse codebook: returns
  * the lowest cid achieving the minimum squared L2 distance (strict `<`
  * scanning cid ascending — identical tie semantics to the two-pass
  * min(d2)/min(cid) form it replaces, and each d2 the same ascending
  * IEEE chain as [[L2Squared]], so the s3/s8 oracle replays are unmoved).
  *
  * Why it exists (round 12): ivfTrain's assignment ran the N×k broadcast
  * scoring TWICE (min-d2 pass + exact-tie re-score pass) plus two hash
  * aggregations over the 89.6M scored rows per assign at sf10 — the
  * dominant cost of the s8/s9/g19 index build. This is [[PqEncode]]'s
  * treatment applied to the coarse quantizer: one projection, one fused
  * k×dim loop per row, no scored-row materialization, no aggregation.
  * The codebook reference object is k×dim doubles — the same bounded
  * √N·Dim transfer the final probe-selection collect already pays
  * (16 MB at N=1e9), and the means-side Lloyd fold stays distributed.
  */
case class L2ArgMin(child: Expression, cents: Array[Double],
    k: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  private def getter: String = child.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(s"l2_argmin over $t")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_argmin expects a float/double array, got $t")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = math.min(x.numElements(), dim)
    var best = -1
    var bestD = Double.MaxValue
    var cid = 0
    while (cid < k) {
      var d = 0.0
      val base = cid * dim
      var i = 0
      while (i < n) {
        val xi = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xi - cents(base + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = cid }
      cid += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("coarseCodebook", cents, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cid = ctx.freshName("cid")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $dim);
        int $best = -1;
        double $bestD = Double.MAX_VALUE;
        for (int $cid = 0; $cid < $k; $cid++) {
          double $d = 0.0;
          int $base = $cid * $dim;
          for (int $i = 0; $i < $n; $i++) {
            double $diff = (double) $a.$getter($i) - $cb[$base + $i];
            $d += $diff * $diff;
          }
          if ($d < $bestD) { $bestD = $d; $best = $cid; }
        }
        ${ev.value} = $best;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2ArgMin {
  /** `cents` is the (k × dim) codebook, flattened row-major by cid. */
  def apply(cents: Array[Array[Double]], emb: Column): Column = {
    val k = cents.length
    val dim = cents.head.length
    val flat = new Array[Double](k * dim)
    var i = 0
    for (c <- 0 until k; j <- 0 until dim) { flat(i) = cents(c)(j); i += 1 }
    bridge.column(L2ArgMin(bridge.expression(emb), flat, k, dim))
  }
}
