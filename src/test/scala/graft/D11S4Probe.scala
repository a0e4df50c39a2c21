package graft

import org.apache.spark.sql.functions._

/** Round-15 decomposition of the two sf100 sweep flags that REPRODUCED
  * isolated (d11 134.5 s / 20×, s4 72.7 s / 19× at 10× data): both ride
  * [[graft.operators.Dedup.d5ScoredPairsOf]], whose cost has two
  * structural terms —
  *
  *   1. probe rows = N·(planes+1) with planes ≈ log2(N) (occupancy-1
  *      bucketing): 10× vectors ⇒ ~12× probe rows. Quasi-linear by
  *      design; the log factor is the price of a flat candidate
  *      FRACTION.
  *   2. candidate PAIRS are answer-proportional, and the synthetic
  *      decade data multiplies the answer quadratically: make_scale
  *      replicates each sf10 vector ~10× with 1–2 sign-bit mutations,
  *      so every replica cluster grows 10× and its internal pair count
  *      ~100×. The engines must SCORE every candidate — the answer
  *      itself is ~100× bigger at sf100.
  *
  * The probe prints, per SF dir: N, planes, probe rows, candidate-pair
  * count (the scored set), d5-threshold pairs, and the scored-pair wall
  * — so the sweep growth can be attributed to measured row counts
  * rather than guessed. A wall growing ~20× while the scored answer
  * grows ~100× is SUBLINEAR per unit of output; the flag closes as
  * answer-growth, not a plan defect, unless the counts say otherwise.
  *
  * Usage: probe_java.sh graft.D11S4Probe <sfDir>
  */
object D11S4Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = GraftSession.get("local[32]")
    import s.implicits._
    val e0 = sources.Tables.embeddings(s, dir)
    val n = e0.count()
    val planes = operators.Dedup.d5Planes(n)
    println(s"vectors: $n  planes: $planes  probeRows/side: ${n * (planes + 1)}")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val scored = timed("scored-pairs count") {
      operators.Dedup.d5ScoredPairsOf(e0, planes).count()
    }
    println(s"candidate pairs scored: $scored")
    val kept = timed("d5 threshold pairs count") {
      operators.Dedup.d5ScoredPairsOf(e0, planes)
        .filter($"cos" >= operators.Dedup.CosineThreshold).count()
    }
    println(s"pairs >= threshold: $kept")
    s.stop()
  }
}
