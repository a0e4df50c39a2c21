package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 invariants: the d5 candidate family must stay
  * answer-proportional (the sf100 probe killed the old shapes), and
  * the plan properties that make it so must not silently regress.
  */
class Round13Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("d5 candidates: exactly-once emission, equal to brute-force Hamming<=2") {
    import s.implicits._
    val emb = operators.Synthetic.embeddings(s, 800)
      .select($"vec_id", $"embedding")
    val planes = operators.Dedup.d5Planes(800)
    val e = operators.Dedup.d5BucketsOf(emb, planes).localCheckpoint(true)
    val cand = operators.Dedup.d5CandidatesOf(e, planes)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once: the split emission (same-bucket direct join +
    // mask-ordinal-guarded probe join) must produce no duplicates —
    // there is no distinct left anywhere to hide one
    assert(cand.length === cand.toSet.size,
      "duplicate candidate pair emitted")
    // completeness + soundness vs brute force over the bucket table
    val b = e.select($"vec_id", $"bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val brute = (for {
      (ia, ba) <- b; (ib, bb) <- b
      if ia < ib && Integer.bitCount(ba ^ bb) <= 2
    } yield (ia, ib)).toSet
    assert(cand.toSet === brute,
      s"candidate set mismatch: got ${cand.length}, brute ${brute.size}")
  }

  test("s4 argmax stays a HashAggregate (no SortAggregate demotion)") {
    val plan = operators.Similarity.s4(s, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
    assert(!plan.contains("SortAggregate"),
      "s4's per-vector argmax demoted to SortAggregate — the partial " +
        "combine is gone and the exploded pair stream gets sorted " +
        "(~55 GB of spill at sf100); keep the packed-long primitive maxes")
    // and the pair stream must never be windowed (the pre-round-13
    // shape sorted the full symmetric pair set per vector)
    assert(!plan.contains("Window"), "pair-stream window reintroduced")
  }

  test("s4 matches the window/rank reference on a synthetic corpus") {
    import s.implicits._
    val emb = operators.Synthetic.embeddings(s, 600)
      .select($"vec_id", $"embedding")
    val planes = operators.Dedup.d5Planes(600)
    val scored = operators.Dedup.d5ScoredPairsOf(emb, planes)
    val sym = scored.union(
      scored.select($"b_id", $"a_id", $"cos").toDF("a_id", "b_id", "cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"a_id").orderBy($"cos".desc, $"b_id")
    val ref = sym.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"a_id".as("vec_id"), $"b_id".as("nn_id"), $"cos".as("nn_cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the packed-long aggregation form, applied to the same pair source
    val idM = (1L << 42) - 1
    val got = sym.select($"a_id".as("vec_id"), $"cos",
        (round($"cos" * 1e6).cast("long") * lit(idM + 1) +
          (lit(idM) - $"b_id")).as("k"))
      .groupBy($"vec_id")
      .agg(max($"cos").as("nn_cos"), max($"k").as("k"))
      .select($"vec_id", (lit(idM) - $"k".bitwiseAND(lit(idM))).as("nn_id"),
        $"nn_cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === ref)
  }
}
