package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers so results hash-match a DuckDB oracle bit-for-bit.
  *
  * Floating-point SUM is order-dependent; at sf0.01 the cross-engine drift
  * already exceeds a round(…, 4). The fix: per-row arithmetic stays in
  * doubles (IEEE ops are bitwise identical across engines), each row is then
  * cast to an exact DECIMAL, and the SUM runs in decimal (exact, order-free).
  * The final value is rounded and lowered back to DOUBLE, which is a
  * correctly-rounded — hence deterministic — conversion in both engines.
  *
  * Every helper has a `Sql` twin producing the equivalent DuckDB text; the
  * Scala and SQL forms must be edited in lockstep.
  */
object Portable {
  private val Exact = DecimalType(30, 10)

  /** Exact decimal total as (DECIMAL(38,10) sum, non-null count), via the
    * carry-accumulator aggregate (see [[graft.functions.ExactDecimalSum]]).
    * The hi·2^62+lo reassembly is exact integer arithmetic on the unscaled
    * value, so the result is identical to `sum(CAST(c AS DECIMAL(30,10)))`.
    */
  private def exactParts(c: Column): (Column, Column) = {
    val st = functions.ExactDecimalSum(c.cast(Exact))
    val unscaled = st.getField("hi").cast(DecimalType(38, 0)) *
      lit(functions.ExactDecimalSum.Base) + st.getField("lo")
    val total = unscaled.cast(DecimalType(38, 10)) / lit(10000000000L)
    (total, st.getField("cnt"))
  }

  /** Order-independent sum of a double expression, rounded to `scale`. */
  def dsum(c: Column, scale: Int = 2): Column = {
    val (total, cnt) = exactParts(c)
    when(cnt === 0, lit(null).cast("double"))
      .otherwise(round(total, scale).cast("double"))
  }
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(round(sum(CAST(($expr) AS DECIMAL(30,10))), $scale) AS DOUBLE)"

  /** Order-independent average (exact decimal sum / count), rounded. */
  def davg(c: Column, scale: Int = 4): Column = {
    val (total, cnt) = exactParts(c)
    when(cnt === 0, lit(null).cast("double"))
      .otherwise(round(total.cast("double") / cnt, scale).cast("double"))
  }
  def davgSql(expr: String, scale: Int = 4): String =
    s"CAST(round(CAST(sum(CAST(($expr) AS DECIMAL(30,10))) AS DOUBLE) / count($expr), $scale) AS DOUBLE)"

  /** Counts as BIGINT on both sides. */
  def dcount(c: Column): Column = count(c).cast("long")
  def dcountSql(expr: String): String = s"CAST(count($expr) AS BIGINT)"
}
