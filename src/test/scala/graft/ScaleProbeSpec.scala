package graft

import graft.functions.SimHash
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale probes over synthetic corpora (testdata is read-only, and the
  * point is to measure candidate-generation selectivity at sizes where a
  * quadratic shape would show): candidate counts from the bucketed joins
  * must stay a small fraction of all-pairs, and the bucketing must not
  * cost recall vs the exact definition.
  */
class ScaleProbeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  /** Deterministic synthetic corpus ([[graft.operators.Synthetic]] —
    * distributed, seeded, planted near-dup twins every 50th doc).
    */
  private def corpus(n: Int): DataFrame =
    operators.Synthetic.documents(s, n.toLong).repartition(32)

  test("d4 MIH candidates stay under 1% of all-pairs on a 5k-doc corpus") {
    val sigs = Dedup.simhashesOf(corpus(5000)).localCheckpoint(true)
    val n = sigs.count()
    val allPairs = n * (n - 1) / 2.0
    val cands = Dedup.simhashCandidates(sigs, Dedup.SimHashMaxHamming).count()
    val frac = cands / allPairs
    info(f"docs=$n candidates=$cands allPairs=${allPairs.toLong} frac=$frac%.5f")
    assert(frac < 0.01, f"candidate fraction $frac%.5f >= 1%% of all-pairs")
    // the planted twins must be found (they sit well inside the radius)
    assert(cands >= 100, s"only $cands candidates — planted twins missed?")
  }

  /** Deterministic synthetic embeddings ([[graft.operators.Synthetic]] —
    * distributed, seeded, planted near-dup twins every 100th vector).
    */
  private def vectors(n: Int): DataFrame =
    operators.Synthetic.embeddings(s, n.toLong).repartition(32)

  test("d5 bucket candidates stay under 0.5% of all-pairs on a 50k-vector corpus") {
    val emb = vectors(50000)
    val n = emb.count()
    val planes = Dedup.d5Planes(n)
    val e = Dedup.d5BucketsOf(emb, planes)
    val cands = Dedup.d5CandidatesOf(e, planes).count()
    val frac = cands / (n * (n - 1) / 2.0)
    info(f"vectors=$n planes=$planes candidates=$cands frac=$frac%.5f")
    assert(frac < 0.005, f"candidate fraction $frac%.5f >= 0.5%% of all-pairs")
    assert(cands >= 500, s"only $cands candidates — planted twins missed?")
  }

  test("d2 LSH band candidates stay under 1% of all-pairs on a 5k-doc corpus") {
    val docs = corpus(5000)
    val n = docs.count()
    val cands = Dedup.minhashCandidatesOf(docs).count()
    val frac = cands / (n * (n - 1) / 2.0)
    info(f"docs=$n candidates=$cands frac=$frac%.5f")
    assert(frac < 0.01, f"candidate fraction $frac%.5f >= 1%% of all-pairs")
    // deterministic (seeded corpus): measures exactly 83 of the 100
    // planted twins at Jaccard ~0.75 — band-LSH's designed operating
    // point; the floor just guards against a broken banding
    assert(cands >= 75, s"only $cands candidates — planted twins missed?")
  }

  test("d4 MIH recall is exact: pairs == brute-force Hamming pairs (1.2k docs)") {
    import s.implicits._
    val sigs = Dedup.simhashesOf(corpus(1200)).localCheckpoint(true)
    val got = Dedup.simhashPairs(sigs, Dedup.SimHashMaxHamming)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val a = sigs.toDF("a_id", "a1", "a2", "a3", "a4")
    val b = sigs.toDF("b_id", "b1", "b2", "b3", "b4")
    val ham = (1 to SimHash.Halves)
      .map(i => expr(s"bit_count(a$i ^ b$i)")).reduce(_ + _)
    val want = a.join(b, $"a_id" < $"b_id")
      .filter(ham <= Dedup.SimHashMaxHamming)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "brute force found no pairs — corpus broken")
    assert(got == want,
      s"MIH=${got.size} brute=${want.size} missing=${(want -- got).take(5)} " +
        s"extra=${(got -- want).take(5)}")
  }
}
