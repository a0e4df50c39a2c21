package graft.operators

import graft.Portable._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational / analytic core (SURVEY §2 B).
  *
  * Every query is declarative DataFrame algebra so Catalyst handles
  * pushdown, pruning and join planning; aggregates follow the
  * [[graft.Portable]] decimal discipline so results hash-match DuckDB.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: multi-measure scan aggregate. */
  def q1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        dcount(lit(1)).as("count_order"))
  }

  val q1Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${dsumSql("l_quantity")} AS sum_qty,
      ${dsumSql("l_extendedprice")} AS sum_base_price,
      ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${davgSql("l_quantity")} AS avg_qty,
      ${davgSql("l_extendedprice")} AS avg_price,
      ${davgSql("l_discount")} AS avg_disc,
      ${dcountSql("1")} AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus"""

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Sql
  )
}
