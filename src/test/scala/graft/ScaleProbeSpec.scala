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

  /** Deterministic synthetic corpus: `n` base docs of 60-120 words from a
    * 3000-word vocab, plus a near-dup twin (3 word substitutions) for
    * every 50th doc. Seeded — identical across runs/JVMs.
    */
  private def corpus(n: Int): DataFrame = {
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val docs = Seq.newBuilder[(Long, String)]
    var id = 0L
    for (i <- 0 until n) {
      val len = 60 + rnd.nextInt(61)
      val words = Array.fill(len)("w" + rnd.nextInt(3000))
      docs += ((id, words.mkString(" "))); id += 1
      if (i % 50 == 0) { // planted near-dup twin
        val twin = words.clone()
        for (_ <- 0 until 3) twin(rnd.nextInt(len)) = "w" + rnd.nextInt(3000)
        docs += ((id, twin.mkString(" "))); id += 1
      }
    }
    docs.result().toDF("doc_id", "text").repartition(32)
  }

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

  /** Deterministic synthetic embeddings: `n` vectors of 64 dims in
    * [-1, 1], every 100th vector followed by a near-dup twin (tiny
    * perturbation, cosine ~0.999).
    */
  private def vectors(n: Int): DataFrame = {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.newBuilder[(Long, Seq[Float])]
    var id = 0L
    for (i <- 0 until n) {
      val v = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
      rows += ((id, v.toSeq)); id += 1
      if (i % 100 == 0) {
        val twin = v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)
        rows += ((id, twin.toSeq)); id += 1
      }
    }
    rows.result().toDF("vec_id", "embedding").repartition(32)
  }

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
    assert(cands >= 90, s"only $cands candidates — planted twins missed?")
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
