package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Exact decimal sum over a `DECIMAL(30,10)` child, as fast long arithmetic
  * (SURVEY §3 — the DeclarativeAggregate extension point; promoted from the
  * round-2 profiling experiment on TPC-H Q1's decimal aggregates).
  *
  * Spark's decimal `Sum` allocates and carries `Decimal` objects through
  * every update/merge. Here the row's unscaled value (an exact long for
  * |v| < 2^63 / 1e10 ≈ 9.2e8 — far above any per-row measure in the star
  * schema) is accumulated into a two-long base-2^62 carry accumulator,
  * entirely in primitive ops inside whole-stage codegen:
  *
  *   t = lo + u;  lo' = t & (2^62 - 1);  hi' = hi + (t >> 62)
  *
  * (for power-of-two bases, `& mask` is the non-negative residue and the
  * arithmetic shift is floor division, so the identity t = (t>>62)·2^62 +
  * (t & mask) holds for negative values too). `lo` stays in [0, 2^62), so
  * exact-total headroom is the hi word: ~2^125 unscaled — unreachable.
  *
  * Codegen discipline: the update expressions deliberately contain NO
  * conditional wrapping of the expensive child cast — `Coalesce(child, 0)`
  * keeps the child in first position (still eligible for subexpression
  * elimination, unlike `If` branches), so the DECIMAL cast runs once per
  * row rather than once per buffer slot.
  *
  * Output is `struct(hi, lo, cnt)`; [[graft.Portable]] reassembles the
  * exact decimal total (hi·2^62 + lo unscaled, /1e10) and applies the
  * usual round/cast — bitwise-equal to
  * `round(sum(CAST(c AS DECIMAL(30,10))), s)`, which the DuckDB hash gate
  * proves on every dsum/davg query.
  */
case class ExactDecimalSum(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  import ExactDecimalSum.{Mask, Shift}

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, cnt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    val zero = Literal.create(Decimal(0L, 30, 10), DecimalType(30, 10))
    val u = UnscaledValue(Coalesce(Seq(child, zero)))
    val t = Add(lo, u, EvalMode.LEGACY)
    Seq(
      Add(hi, ShiftRight(t, Literal(Shift)), EvalMode.LEGACY),
      BitwiseAnd(t, Literal(Mask)),
      Add(cnt, If(IsNull(child), Literal(0L), Literal(1L)), EvalMode.LEGACY))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val t = Add(lo.left, lo.right, EvalMode.LEGACY)
    Seq(
      Add(Add(hi.left, hi.right, EvalMode.LEGACY),
        ShiftRight(t, Literal(Shift)), EvalMode.LEGACY),
      BitwiseAnd(t, Literal(Mask)),
      Add(cnt.left, cnt.right, EvalMode.LEGACY))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("hi"), hi, Literal("lo"), lo, Literal("cnt"), cnt))

  override protected def withNewChildInternal(c: Expression): ExactDecimalSum =
    copy(child = c)
}

object ExactDecimalSum {
  private[functions] val Shift = 62
  private[functions] val Mask = (1L << Shift) - 1
  /** 2^62 — the lo-word base; hi counts carries of this many unscaled
    * units.
    */
  val Base: Long = 1L << Shift

  /** Column API: aggregate to `struct(hi, lo, cnt)` (see class doc). The
    * caller must have cast `c` to DECIMAL(30,10).
    */
  def apply(c: Column): Column =
    bridge.column(ExactDecimalSum(bridge.expression(c)).toAggregateExpression())
}
