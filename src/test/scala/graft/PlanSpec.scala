package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the optimizations SURVEY §4 promises must be
  * visible in the physical plan, not just intended.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2 pushes filters and prunes columns at the parquet scan") {
    val p = plan(Relational.q2(s, d))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(400))
    // only the 6 referenced columns reach the scan
    assert(!p.contains("l_comment") && !p.contains("l_returnflag"))
  }

  test("q3 and q5 broadcast their dimension sides") {
    assert(plan(Relational.q3(s, d)).contains("BroadcastHashJoin"))
    val p5 = plan(Relational.q5(s, d))
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 3, "q5 should broadcast dims")
  }

  test("maybeBroadcast hints small plans and stands down on huge ones") {
    import s.implicits._
    val small = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // the hint lives in the analyzed plan (the optimizer strips hints
    // that aren't under a join), so assert there
    val hinted = plans.Hints.maybeBroadcast(small)
      .queryExecution.analyzed.toString
    assert(hinted.contains("ResolvedHint"), hinted.take(300))
    // spark.range carries exact 8-bytes/row Catalyst stats, so a
    // 10^12-row range is a plan-time "this is terabytes" signal with no
    // job run — the guard must NOT hint it (AQE would decide at runtime)
    val huge = plans.Hints.maybeBroadcast(s.range(1000000000000L).toDF())
      .queryExecution.analyzed.toString
    assert(!huge.contains("ResolvedHint"), huge.take(300))
  }

  test("q1 uses hash aggregation with map-side partial aggregation") {
    val p = plan(Relational.q1(s, d))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_exactdecimalsum"), "map-side combine missing")
  }

  test("d4 and d5 candidate joins are equi-joins, not broadcast NLJ") {
    val p4 = plan(operators.Dedup.d4(s, d))
    assert(!p4.contains("BroadcastNestedLoopJoin"), p4.take(400))
    val p5 = plan(operators.Dedup.d5(s, d))
    assert(!p5.contains("BroadcastNestedLoopJoin"), p5.take(400))
  }

  test("q21's fact-keyed aggregate joins by shuffle, not a broadcast hint") {
    // with AQE and auto-broadcast off, ONLY an explicit broadcast(thr)
    // hint could produce a BroadcastHashJoin here — so this fails exactly
    // when someone re-adds the round-2 hint (the thr side has one row per
    // l_partkey and must not be built as a broadcast at scale); AQE's
    // legitimate stat-based choice at tiny SF is excluded from the check
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Relational.q21(s, d))
      assert(!p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin"),
        "thr side must reach the join via shuffle, not broadcast:\n" + p.take(600))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a shuffle join for the thr side:\n" + p.take(600))
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("d8's eval-gram side is broadcast, the corpus side streams") {
    val p = plan(operators.Dedup.d8(s, d))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_part_").toString
    sources.Tables.lineitem(s, d)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val back = s.read.parquet(out).filter(col("l_returnflag") === "R")
    val p = plan(back)
    assert(p.contains("PartitionFilters: [isnotnull(l_returnflag"), p.take(600))
    val full = sources.Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R").count()
    assert(back.count() == full)
  }

  test("h4 gate query scan carries the partition filter") {
    val p = plan(sources.Roundtrip.h4(s, d))
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p.take(600))
  }

  test("h5 gate query joins bucketed tables without a join-key shuffle") {
    val (join, cleanup) = sources.Roundtrip.h5WithCleanup(s, d)
    try {
      val p = plan(join)
      assert(p.contains("SortMergeJoin"), p.take(400))
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed gate join should not shuffle join keys:\n" + p.take(1500))
    } finally cleanup()
  }

  test("q39 sliding windows place every event in exactly 4 windows") {
    val total = Relational.q39(s, d).agg(sum(col("n_events"))).head().getLong(0)
    assert(total == 4 * sources.Tables.events(s, d).count())
  }

  test("q40 salted join equals the plain join aggregate") {
    val salted = Relational.q40(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = sources.Tables.lineitem(s, d)
      .join(sources.Tables.part(s, d),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        Portable.dsum(col("l_quantity"), 2).as("total_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("s4 covers the corpus and dominates every thresholded d5 pair") {
    val nn = operators.Similarity.s4(s, d).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(nn.size == sources.Tables.embeddings(s, d).count())
    val pairs = operators.Dedup.d5(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, c) =>
      assert(nn(a) >= c && nn(b) >= c,
        s"best-neighbor cos must dominate pair ($a,$b,$c)")
    }
  }
}
