package graft

import graft.operators.{Dedup, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** t22 (CCNet quality buckets) and d14 (Bloom contamination pre-filter). */
class BucketsBloomSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("t22 buckets equal the strictly-better-count rule, ties share") {
    val rows = TextOps.t22(s, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val n = docs.length.toLong
      docs.foreach { case (_, _, q, bucket) =>
        val better = docs.count(_._3 > q).toLong
        val exp = if (better * 3 < n) "head"
        else if (better * 3 < n * 2) "middle" else "tail"
        assert(bucket == exp, s"q=$q better=$better n=$n")
      }
      // equal qualities always land in the same bucket
      docs.groupBy(_._3).values.foreach(g =>
        assert(g.map(_._4).distinct.size == 1))
      assert(docs.exists(_._4 == "head"))
    }
  }

  test("d14 has no false negatives and agrees with t21's exact counts") {
    val d14 = Dedup.d14(s, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(d14.nonEmpty)
    // THE Bloom invariant: maybe-hits can only over-report
    d14.values.foreach { case (n, bloom, exact) =>
      assert(exact <= bloom && bloom <= n)
    }
    // the exact side is t21's containment count over the same shingles
    val t21 = TextOps.t21(s, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d14.keySet == t21.keySet)
    d14.foreach { case (id, (n, _, exact)) =>
      assert((n, exact) == t21(id), s"doc $id")
    }
    // planted near-dups make some test docs genuinely contaminated
    assert(d14.values.exists(_._3 > 0))
  }
}
