package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Dev probe: candidate-generation selectivity of the dedup families on
  * the SF-DATA corpora (not the synthetic ones — those have a constant
  * near-dup pair fraction by construction, so their candidate counts
  * grow quadratically because the ANSWER does, and say nothing about
  * algorithm linearity). Run at two adjacent decades (sf10 → sf100) and
  * compare: a linear candidate generator grows candidates ~decade×, a
  * quadratic one ~decade²×.
  *
  * Usage: runMain graft.SfFracProbe <sfDir> [d2|d4|d5 ...]
  */
object SfFracProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.drop(1).toSet
                else Set("d2", "d4", "d5")
    val s = GraftSession.get(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    s.sparkContext.setLogLevel("WARN")
    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def frac(c: Long, n: Long): Double = c / (n * (n - 1) / 2.0)
    def drop(): Unit =
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    if (which("d2") || which("d4")) {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val nd = docs.count()
      if (which("d2")) {
        val (c2, t2) = timed(Dedup.minhashCandidatesOf(docs).count())
        println(f"SFFRAC d2 dir=$dir docs=$nd cands=$c2 frac=${frac(c2, nd)}%.3e sec=$t2%.1f")
        drop()
      }
      if (which("d4")) {
        val sigs = Dedup.simhashesOf(docs).localCheckpoint(true)
        val (c4, t4) = timed(
          Dedup.simhashCandidates(sigs, Dedup.SimHashMaxHamming).count())
        println(f"SFFRAC d4 dir=$dir docs=$nd cands=$c4 frac=${frac(c4, nd)}%.3e sec=$t4%.1f")
        drop()
      }
    }
    if (which("d5")) {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val nv = emb.count()
      val planes = Dedup.d5Planes(nv)
      val bkts = Dedup.d5BucketsOf(emb, planes)
      val (c5, t5) = timed(Dedup.d5CandidatesOf(bkts, planes).count())
      println(f"SFFRAC d5 dir=$dir vectors=$nv planes=$planes cands=$c5 frac=${frac(c5, nv)}%.3e sec=$t5%.1f")
      drop()
    }
    s.stop()
  }
}
