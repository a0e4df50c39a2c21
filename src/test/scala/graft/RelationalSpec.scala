package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("every relational query has an oracle and runs non-empty") {
    Relational.queries.foreach { case (name, fn) =>
      assert(Relational.oracles.contains(name), s"$name missing oracle")
      val df = fn(s, d)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q1 groups by the 6 flag/status combos with positive sums") {
    val rows = Relational.q1(s, d).collect()
    assert(rows.length <= 6 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("avg_disc") >= 0 && r.getAs[Double]("avg_disc") <= 1)
    }
  }

  test("q3 top-10 is sorted by revenue desc") {
    val rev = Relational.q3(s, d).collect().map(_.getAs[Double]("revenue"))
    assert(rev.length <= 10)
    assert(rev.sameElements(rev.sortBy(-_)))
  }

  test("q8 custdist covers all customers") {
    val total = Relational.q8(s, d)
      .agg(sum(col("c_count") * lit(0) + col("custdist"))).collect()(0).getLong(0)
    val nCust = sources.Tables.customer(s, d).count()
    assert(total == nCust)
  }

  test("q9 ranks are within 1..3 and unique per (custkey, orderkey)") {
    val df = Relational.q9(s, d)
    assert(df.filter(col("rnk") < 1 || col("rnk") > 3).count() == 0)
    assert(df.groupBy("o_custkey", "o_orderkey").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("q18 as-of never matches a purchase after the click") {
    val bad = Relational.q18(s, d)
      .filter(col("p_ts").isNotNull && col("p_ts") > col("click_ts"))
    assert(bad.count() == 0)
  }

  test("q37 sample rates land near the per-stratum targets") {
    val total = sources.Tables.orders(s, d)
      .groupBy(col("o_orderstatus")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Relational.q37(s, d)
      .groupBy(col("o_orderstatus")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.StratRates.foreach { case (st, thr) =>
      val rate = thr.toDouble / 4294967296.0
      val n = total(st).toDouble
      val got = sampled.getOrElse(st, 0L).toDouble
      // 5-sigma binomial band: md5 fractions behave uniformly
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(got - n * rate) <= 5 * sigma + 1,
        s"stratum $st: sampled $got of $n at target rate $rate")
    }
  }

  test("q38 funnel timestamps are strictly ordered and stages consistent") {
    val rows = Relational.q38(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[java.sql.Timestamp]("v_ts")
      val c = r.getAs[java.sql.Timestamp]("c_ts")
      val p = r.getAs[java.sql.Timestamp]("p_ts")
      val stage = r.getAs[Int]("stage")
      assert(v != null)
      if (p != null) assert(c != null, "purchase stage requires click stage")
      if (c != null) assert(c.after(v))
      if (p != null) assert(p.after(c))
      assert(stage == 1 + (if (c != null) 1 else 0) + (if (p != null) 1 else 0))
    }
  }

  test("q41 histogram quantiles land within two buckets of exact") {
    val o = sources.Tables.orders(s, d)
    val mm = o.agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
    val width = (mm.getDouble(1) - mm.getDouble(0)) / Relational.HistBuckets
    val exact = o.groupBy(col("o_orderstatus")).agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Relational.q41(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e50, e90) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - e50) <= 2 * width + 1e-6,
        s"${r.getString(0)} p50 est ${r.getDouble(1)} vs exact $e50")
      assert(math.abs(r.getDouble(2) - e90) <= 2 * width + 1e-6,
        s"${r.getString(0)} p90 est ${r.getDouble(2)} vs exact $e90")
    }
  }

  test("q42 week-0 cells equal cohort sizes and offsets are nonnegative") {
    val r = Relational.q42(s, d).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(1) >= 0))
    val cohorts = sources.Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
      .groupBy(col("cw")).count().collect()
      .map(x => x.getTimestamp(0) -> x.getLong(1)).toMap
    r.filter(_.getLong(1) == 0).foreach { row =>
      assert(row.getLong(2) == cohorts(row.getTimestamp(0)),
        s"cohort ${row.getTimestamp(0)} week-0 count")
    }
  }

  test("q22 sessions are disjoint and ordered per user") {
    val df = Relational.q22(s, d).orderBy("user_id", "session_id").collect()
    df.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("session_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.getAs[java.sql.Timestamp]("session_end")
            .after(b.getAs[java.sql.Timestamp]("session_start")))
        case _ =>
      }
    }
  }
}
