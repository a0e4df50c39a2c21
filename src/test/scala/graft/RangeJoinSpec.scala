package graft

import graft.operators.Relational
import graft.plans.RangeJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def sides = {
    val ev = Tables.events(s, d)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    (v, c)
  }

  test("custom RangeJoinExec matches the declarative range join (q19)") {
    val (v, c) = sides
    val custom = RangeJoin.join(v, c, "v_user", "c_user", "v_ts", "c_ts",
        10L * 60 * 1000000)
      .select(col("view_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val declarative = Relational.q19(s, d)
      .select(col("view_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == declarative, s"custom=${custom.size} declarative=${declarative.size}")
  }

  test("the planner uses RangeJoinExec with sorted, clustered children") {
    val (v, c) = sides
    val plan = RangeJoin.join(v, c, "v_user", "c_user", "v_ts", "c_ts", 1000000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin "), plan.take(400))
    assert(plan.contains("Sort ["), "planner should insert required sorts")
    assert(plan.contains("Exchange hashpartitioning"),
      "planner should cluster both sides on the key")
  }

  test("empty right side yields empty result (no hang, no error)") {
    val (v, c) = sides
    val emptyClicks = c.filter(col("click_id") < 0)
    assert(RangeJoin.join(v, emptyClicks, "v_user", "c_user", "v_ts", "c_ts",
      1000000L).count() == 0)
  }

  test("unknown column and bad types produce clear errors") {
    val (v, c) = sides
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.join(v, c, "nope", "c_user", "v_ts", "c_ts", 1L)
    }
    assert(e1.getMessage.contains("no column nope"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.join(v.withColumn("v_user", col("v_user").cast("string")), c,
        "v_user", "c_user", "v_ts", "c_ts", 1L)
    }
    assert(e2.getMessage.contains("must be LongType"))
  }
}
