package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: t23 exact heavy hitters. */
class Round11Spec extends AnyFunSuite {
  private lazy val s = GraftSession.get("local[4]")
  private val dir = "/root/testdata/sf0.001"

  test("t23 equals the plain vocab-wide groupBy/HAVING form") {
    import s.implicits._
    val got = operators.TextOps.t23(s, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val tok = sources.Tables.documents(s, dir)
      .select(explode(graft.functions.Text.tokens($"text")).as("token"))
    val n = tok.count()
    val want = tok.groupBy($"token").agg(count(lit(1)).as("c"))
      .filter($"c" * operators.TextOps.HhK > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "heavy set must be non-empty at the gate SF")
    assert(got === want)
  }

  test("t23 result is independent of the partition layout MG saw") {
    // MG candidate SETS depend on how rows land in partitions; the
    // recount+filter must erase that. Run the same op against single-
    // and many-partition layouts of the identical corpus and require
    // bit-identical results.
    import s.implicits._
    val docs = sources.Tables.documents(s, dir)
    def run(parts: Int): Set[(String, Long)] = {
      val tok = docs.repartition(parts)
        .select(explode(graft.functions.Text.tokens($"text")).as("token"))
      // t23's OWN pass-1 summarizer over a pinned layout (shared code —
      // the spec cannot drift from the shipped MG implementation)
      val mg = operators.TextOps.mgSummaries(tok.as[String])
        .localCheckpoint(true)
      val nDf = mg.filter($"is_tally").agg(sum($"cnt").as("n"))
      val cand = mg.filter(!$"is_tally").select($"token").distinct()
      tok.join(cand, "token")
        .groupBy($"token").agg(count(lit(1)).cast("long").as("c"))
        .crossJoin(broadcast(nDf))
        .filter($"c" * operators.TextOps.HhK > $"n")
        .select($"token", $"c")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(run(1) === run(13))
  }

  test("t23 MG pass bounds what reaches the exchange") {
    // the checkpointed pass-1 frame is the ONLY thing shuffled besides
    // candidate-matched recount rows: assert its size is bounded by
    // capacity x partitions + one tally row per partition
    import s.implicits._
    val tok = sources.Tables.documents(s, dir)
      .select(explode(graft.functions.Text.tokens($"text")).as("token"))
    val parts = tok.rdd.getNumPartitions
    val mgRows = operators.TextOps.t23(s, dir) // force once (sanity)
    assert(mgRows.columns.toSeq === Seq("token", "c"))
    val cap = (operators.TextOps.HhK.toLong + 1L) * parts
    // one candidate row per surviving MG entry + one tally row per
    // partition — counted off the SHIPPED summarizer, not a copy
    val candRows = operators.TextOps.mgSummaries(tok.as[String]).count()
    assert(candRows <= cap)
  }
}
