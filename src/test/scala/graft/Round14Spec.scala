package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 invariants: the materializing gate queries' REAL plans must
  * reach PlanAudit (round 13's audit only ever saw their post-checkpoint
  * LogicalRDD scans), via the Materialize audit tap.
  */
class Round14Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("audit tap records lazy frames only while enabled, drains once") {
    import s.implicits._
    plans.Materialize.drainAuditTap() // isolate from other suites
    val df = Seq(1, 2).toDF("x")
    plans.Materialize.enableAuditTap()
    try {
      assert(plans.Materialize.tapForAudit(df) eq df)
      val drained = plans.Materialize.drainAuditTap()
      assert(drained.exists(_ eq df), "tapped frame not drained")
      assert(plans.Materialize.drainAuditTap().isEmpty,
        "drain not idempotent")
    } finally plans.Materialize.disableAuditTap()
    // disabled again: later suites' materializing ops must not accumulate
    plans.Materialize.tapForAudit(df)
    assert(plans.Materialize.drainAuditTap().isEmpty, "tap still recording")
  }

  test("q60 joins the facts with NO exchange on either fact side") {
    val df = operators.Relational.q60(s, TestSpark.sf)
    df.count() // finalize the AQE tree
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // the raw q5 plan shuffles BOTH facts on the order key; the bucketed
    // layout's whole point is that neither exchange exists
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      "lineitem side shuffled — bucketed layout not picked up")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      "orders side shuffled — bucketed layout not picked up")
  }

  test("q60 returns exactly q5's rows (layout is answer-invariant)") {
    import org.apache.spark.sql.functions.col
    val a = operators.Relational.q5(s, TestSpark.sf)
      .orderBy(col("r_name"), col("n_name")).collect().toSeq
    val b = operators.Relational.q60(s, TestSpark.sf)
      .orderBy(col("r_name"), col("n_name")).collect().toSeq
    assert(a == b)
  }

  test("h5's tapped pre-checkpoint plan carries the real SMJ") {
    plans.Materialize.enableAuditTap()
    plans.Materialize.drainAuditTap()
    try {
      sources.Roundtrip.queries("h5_bucketed_join")(s, TestSpark.sf)
      val tapped = plans.Materialize.drainAuditTap()
      assert(tapped.nonEmpty, "h5 recorded no lazy plan for the audit")
      assert(tapped.exists(
        _.queryExecution.optimizedPlan.toString.contains("Join")),
        "tapped h5 plan is not the join (audit blind spot back)")
      // and the checkpointed RESULT is the blind spot the tap fixes
      val res = sources.Roundtrip.queries("h5_bucketed_join")(s, TestSpark.sf)
      assert(res.queryExecution.analyzed.toString.contains("LogicalRDD"))
    } finally plans.Materialize.disableAuditTap()
  }
}
