package graft

import org.apache.spark.sql.functions._

/** Round-11 g10 cost anatomy at sf10: the maint split exposed op_s =
  * 38 s (sim_s 3.2) — decompose the per-batch maintenance body into its
  * stages (band rows of the arriving docs, shingle-set build, candidate
  * band join + distinct, jaccard verify + best-match window) so the
  * optimization target is measured, not guessed.
  *
  * Usage: Test/runMain graft.G10Anatomy <sfDir>
  */
object G10Anatomy {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf10data"
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import operators.Dedup
    import graft.functions.Text

    val docs = sources.Tables.documents(s, dir)
    val corpus = docs.filter($"doc_id" < Dedup.IncrSplit)
    val fresh = docs.filter($"doc_id" >= Dedup.IncrSplit)
    println(s"corpus=${corpus.count()} fresh=${fresh.count()}")

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val corpusBands = timed("corpusBands build") {
      Dedup.bandRowsOf(corpus).toDF("a_id", "bi", "bh").localCheckpoint(true)
    }
    val corpusSh = timed("corpusSh build") {
      corpus.withColumn("toks", Text.tokens($"text"))
        .select($"doc_id".as("a_id"),
          array_distinct(Text.shingles($"toks")).as("a_sh"))
        .localCheckpoint(true)
    }
    // stage 1: band rows of the arriving half (the full fresh set at once
    // — batch partitioning doesn't change total work)
    val bb = timed("fresh bandRows") {
      Dedup.bandRowsOf(fresh).toDF("b_id", "bi", "bh").localCheckpoint(true)
    }
    // stage 2: candidate join + distinct
    val cand = timed("cand join+distinct") {
      val c = corpusBands.join(bb, Seq("bi", "bh"))
        .select($"a_id", $"b_id").distinct().localCheckpoint(true)
      println(s"  candidates: ${c.count()}")
      c
    }
    // stage 3: fresh shingle sets (the second tokenize pass)
    val bsh = timed("fresh shingle sets") {
      fresh.withColumn("toks", Text.tokens($"text"))
        .select($"doc_id".as("b_id"),
          array_distinct(Text.shingles($"toks")).as("b_sh"))
        .localCheckpoint(true)
    }
    // stage 4: verify + window
    timed("jaccard verify + window") {
      val scored = cand.join(corpusSh, "a_id").join(bsh, "b_id")
        .select($"b_id".as("doc_id"), $"a_id".as("dup_of"),
          round(size(array_intersect($"a_sh", $"b_sh")) * lit(1.0) /
            size(array_union($"a_sh", $"b_sh")), 6).as("jaccard"))
        .filter($"jaccard" >= Dedup.IncrJaccard)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"jaccard".desc, $"dup_of")
      val n = scored.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).drop("rn").count()
      println(s"  matches: $n")
    }
    s.stop()
  }
}
