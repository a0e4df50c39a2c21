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

  /** Order-independent sum of a double expression, rounded to `scale`. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(Exact)), scale).cast("double")
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(round(sum(CAST(($expr) AS DECIMAL(30,10))), $scale) AS DOUBLE)"

  /** Order-independent average (exact decimal sum / count), rounded. */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(Exact)).cast("double") / count(c), scale).cast("double")
  def davgSql(expr: String, scale: Int = 4): String =
    s"CAST(round(CAST(sum(CAST(($expr) AS DECIMAL(30,10))) AS DOUBLE) / count($expr), $scale) AS DOUBLE)"

  /** Counts as BIGINT on both sides. */
  def dcount(c: Column): Column = count(c).cast("long")
  def dcountSql(expr: String): String = s"CAST(count($expr) AS BIGINT)"
}
