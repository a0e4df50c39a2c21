package graft

import graft.operators.{Dedup, Synthetic}

/** Dev probe: candidate-generation selectivity + wall time ONE DECADE
  * above the bench's standing probes (50k docs / 500k vectors vs the
  * bench's 5.1k / 50.5k) — a quadratic candidate generator that hides at
  * the bench scale cannot hide here. Run once per major index change;
  * results recorded in SURVEY §6.
  * Usage: runMain graft.ScaleProbe2 [nDocs nVecs] (default 50000 500000;
  * round 13 runs 500000 2000000 — the sf100 decade).
  */
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def frac(c: Long, n: Long): Double = c / (n * (n - 1) / 2.0)

    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val nVecs = args.drop(1).headOption.map(_.toInt).getOrElse(500000)
    val docs = Synthetic.documents(s, nDocs).localCheckpoint(true)
    val nd = docs.count()
    val sigs = Dedup.simhashesOf(docs).localCheckpoint(true)
    val (c4, t4) = timed(Dedup
      .simhashCandidates(sigs, Dedup.SimHashMaxHamming).count())
    println(f"SCALE2 d4 docs=$nd cands=$c4 frac=${frac(c4, nd)}%.7f sec=$t4%.1f")
    val (c2, t2) = timed(Dedup.minhashCandidatesOf(docs).count())
    println(f"SCALE2 d2 docs=$nd cands=$c2 frac=${frac(c2, nd)}%.7f sec=$t2%.1f")

    val emb = Synthetic.embeddings(s, nVecs).localCheckpoint(true)
    val nv = emb.count()
    val planes = Dedup.d5Planes(nv)
    val bkts = Dedup.d5BucketsOf(emb, planes)
    val (c5, t5) = timed(Dedup.d5CandidatesOf(bkts, planes).count())
    println(f"SCALE2 d5 vecs=$nv planes=$planes cands=$c5 frac=${frac(c5, nv)}%.7f sec=$t5%.1f")
    s.stop()
  }
}
