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
