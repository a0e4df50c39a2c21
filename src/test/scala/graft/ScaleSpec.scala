package graft

import graft.operators.{Relational, Skew}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanism specs: salting, bucketing, sketches (SURVEY §4). */
class ScaleSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("salted join returns exactly the plain join's result") {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "l_linenumber", 8)
    assert(salted.count() == plain.count())
    val pSum = plain.agg(sum(col("l_quantity") + col("o_totalprice"))).collect()(0).getDouble(0)
    val sSum = salted.agg(sum(col("l_quantity") + col("o_totalprice"))).collect()(0).getDouble(0)
    assert(math.abs(pSum - sSum) < 1e-6 * math.abs(pSum))
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets_").toString
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(s, d).write.mode("overwrite")
      .option("path", s"$wh/b_orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(s, d).write.mode("overwrite")
      .option("path", s"$wh/b_lineitem")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    // force the sort-merge path (hint on a join input, not the agg) so
    // bucketing rather than broadcast carries the join
    val j = s.table("b_lineitem").hint("merge").join(s.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(400))
    // no shuffle on the join keys — bucket layout co-locates them (the
    // post-join agg exchange on o_orderstatus is expected)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      "bucketed join should not shuffle join keys:\n" + plan.take(1500))
    assert(j.count() > 0)
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("q27 sampled quantiles hit the target RANK within 3 sigma") {
    // a sampling quantile sketch guarantees rank error (the epsilon-n
    // bound GK/KLL state), not value error: the estimate's position in
    // the exact sorted data must sit within 3 binomial sigmas
    // sqrt(q(1-q)/n_sample) of the target quantile
    val approx = Relational.q27(s, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val all = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    // same sample sizes the query saw (1/8 Bernoulli per group)
    val nSamp = all.view.mapValues(_.length / 8.0).toMap
    approx.foreach { case (k, (a50, a95)) =>
      val xs = all(k)
      def rankErr(v: Double, q: Double): Double = {
        val lo = xs.indexWhere(_ >= v)
        val hi = xs.lastIndexWhere(_ <= v)
        val target = q * (xs.length - 1)
        math.min(math.abs(lo - target), math.abs(hi - target)) / xs.length
      }
      def sigma(q: Double): Double = math.sqrt(q * (1 - q) / nSamp(k))
      assert(rankErr(a50, 0.50) <= 3 * sigma(0.50), s"$k p50 rank err")
      assert(rankErr(a95, 0.95) <= 3 * sigma(0.95), s"$k p95 rank err")
    }
    assert(approx.nonEmpty)
  }

  test("q23 KMV sketch is within 5% of exact distinct counts") {
    val approx = Relational.q23(s, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (eo, ep)) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - eo) <= math.max(2.0, 0.05 * eo), s"$k orders $ao vs $eo")
      assert(math.abs(ap - ep) <= math.max(2.0, 0.05 * ep), s"$k parts $ap vs $ep")
    }
  }

  test("q36 KMV estimate is within 3 sigma of exact distinct users") {
    val approx = Relational.q36(s, d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(s, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // KMV std error ~ 1/sqrt(K-1) ≈ 12.6% at K=64; allow 3 sigma
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(2.0, 0.38 * e), s"$k users $a vs $e")
    }
  }
}
