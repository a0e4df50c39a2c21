package graft

import graft.operators.{Relational, Similarity}
import graft.sources.{Roundtrip, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** This round's additions: market share (q43), customer order-count
  * distribution (q44), lateral top-n (q45), the persisted PQ index (s7)
  * and small-file compaction (h7). Each checked against a sequential
  * reference or a structural invariant independent of the DuckDB gate.
  */
class MaintenanceOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("q43 market share is in [0,1] and volumes are consistent") {
    val rows = Relational.q43(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getAs[Double]("nation_volume"),
        r.getAs[Double]("total_volume"), r.getAs[Double]("mkt_share"))
      assert(nat >= 0 && nat <= tot, s"yr ${r.get(0)}: $nat > $tot")
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - nat / tot) < 1e-6)
    }
  }

  test("q44 distribution sums back to the customer count") {
    val rows = Relational.q44(s, d).collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total == Tables.customer(s, d).count())
  }

  test("q45 lateral top-3 equals the window-rank formulation") {
    import s.implicits._
    val got = Relational.q45(s, d)
      .select($"nation", $"custkey").as[(String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    val expect = Tables.customer(s, d)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey").as[(String, Long)].collect().toSet
    assert(got == expect)
  }

  test("s7 persisted-index results equal the live s6 index") {
    import s.implicits._
    val live = Similarity.s6(s, d)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    val persisted = Similarity.s7(s, d)
      .select($"query_id", $"neighbor_id", $"rnk")
      .as[(Long, Long, Long)].collect().toSet
    assert(live == persisted)
  }

  test("h7 compaction shrinks the file count and preserves content") {
    val (compacted, (nFrag, nOut)) = Roundtrip.h7Compact(s, d)
    assert(nFrag == 64, s"fragmented layout had $nFrag files")
    assert(nOut < nFrag, s"compaction did not shrink: $nFrag -> $nOut")
    val src = Tables.lineitem(s, d)
    assert(compacted.count() == src.count())
    // exact content: anti-join both ways is empty on the full row
    val cols = src.columns.toSeq
    assert(compacted.join(src, cols, "left_anti").count() == 0)
    assert(src.join(compacted, cols, "left_anti").count() == 0)
  }

  test("h8 merged read null-fills the old generation exactly") {
    import s.implicits._
    val merged = Roundtrip.h8(s, d)
    val o = Tables.orders(s, d)
    assert(merged.count() == o.count())
    // every even-key row (old generation) has a null priority; every
    // odd-key row carries its original value
    assert(merged.filter($"o_orderkey" % 2 === 0 &&
      $"o_orderpriority".isNotNull).count() == 0)
    val oddGot = merged.filter($"o_orderkey" % 2 === 1)
      .select($"o_orderkey", $"o_orderpriority")
      .as[(Long, String)].collect().toMap
    val oddExp = o.filter($"o_orderkey" % 2 === 1)
      .select($"o_orderkey", $"o_orderpriority")
      .as[(Long, String)].collect().toMap
    assert(oddGot == oddExp)
  }

  test("h9 incremental view refresh equals the full recompute") {
    import s.implicits._
    val full = Roundtrip.h6(s, d)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        round(sum($"o_totalprice"
          .cast(org.apache.spark.sql.types.DecimalType(30, 10))), 2)
          .cast("double").as("total"))
      .as[(String, Long, Double)].collect().toSet
    val incr = Roundtrip.h9(s, d)
      .as[(String, Long, Double)].collect().toSet
    assert(incr == full)
    assert(incr.nonEmpty)
  }

  test("g14 streaming view refresh equals the batch h9 refresh") {
    import s.implicits._
    val batch = Roundtrip.h9(s, d)
      .as[(String, Long, Double)].collect().toSet
    val streamed = streaming.StreamOps.g14(s, d)
      .as[(String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q46 equals the window-count formulation of sole-R-supplier") {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter($"o_orderstatus" === "F")
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
    val perOrder = li.groupBy($"l_orderkey".as("ok"))
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct(when($"l_returnflag" === "R", $"l_suppkey"))
          .as("n_r_supp"))
    val expect = li.filter($"l_returnflag" === "R")
      .join(perOrder.filter($"n_supp" > 1 && $"n_r_supp" === 1),
        $"l_orderkey" === $"ok")
      .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .as[(String, Long)].collect().toMap
    val got = operators.Relational.q46(s, d)
      .as[(String, Long)].collect().toMap
    assert(got == expect)
  }

  test("t21 contamination matches a JVM set-containment reference") {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", graft.functions.Text.tokens($"text").as("toks"))
      .as[(Long, Seq[String])].collect()
    def shOf(t: Seq[String]) =
      if (t.size < 5) Seq.empty[String]
      else (0 to t.size - 5).map(i => t.slice(i, i + 5).mkString(" "))
    val train = docs.filter(_._1 % 10 != 0).flatMap(d0 => shOf(d0._2)).toSet
    val expect = docs.filter(_._1 % 10 == 0).map { case (id, t) =>
      val sh = shOf(t)
      (id, (sh.size.toLong, sh.count(train).toLong))
    }.toMap
    val got = operators.TextOps.t21(s, d)
      .select($"doc_id", $"n_shingles", $"n_hit")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, h) => (id, (n, h)) }.toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("g13 streaming ingest+compaction preserves content, bounds files") {
    val (table, (appended, compactions, finalFiles)) =
      streaming.StreamOps.g13Run(s, d)
    assert(compactions >= 1, "no compaction pass ever triggered")
    assert(finalFiles < appended,
      s"final layout not compacted: $finalFiles vs $appended appended")
    val src = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    assert(table.count() == src.count())
    val cols = src.columns.toSeq
    assert(table.join(src, cols, "left_anti").count() == 0)
    assert(src.join(table, cols, "left_anti").count() == 0)
  }
}
