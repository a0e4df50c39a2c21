package graft.operators

import org.apache.spark.sql.functions._

/** Stage-level timing of s2Scored/s5 (round 12): located the ~40 s the
  * round-11 verdict attributed to "candidate scoring" in the CORPUS
  * BUCKETING projection, and pinned it as a JIT cliff, not data cost —
  * 1-table materialization 1.8 s, 2-table 3.6 s, 4-table 42-48 s while
  * an aggregate over the same expressions ran in 0.7 s (column pruning
  * kept its generated method small). Four 16-When/16-DotProduct bucket
  * trees in one generated consume() crossed HotSpot's huge-method
  * bytecode threshold and the stage ran in the bytecode interpreter.
  * Fix: the [[graft.functions.SignBucket]] nested-loop kernel — this
  * probe's bucket-checkpoint stage dropped 42 -> 2.7 s at sf10, s5
  * end-to-end 48 -> 3.1 s, s2 37 -> 4.3 s (QProbe, same host). The
  * candidate-set-reuse A/B the verdict proposed is therefore moot:
  * regenerating the shared stage costs ~3 s, below any
  * checkpoint-materialization price (the t21 recompute-beats-materialize
  * result, a fortiori).
  *
  * Usage: Test/runMain graft.operators.S5Anatomy <sfDir>
  */
object S5Anatomy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf10data")
    val s = graft.GraftSession.get("local[32]")
    import s.implicits._
    import Similarity._

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[s5anat] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e0 = graft.sources.Tables.embeddings(s, dir)
    val n = timed("count")(e0.count())
    val p = numPlanes(n)
    println(s"[s5anat] n=$n p=$p wb=${weakBits(p)} r=${poolRadius(p)} " +
      s"budget=${probeBudget(p)} pool=${probeSubsets(weakBits(p), poolRadius(p)).size}")

    // stage 1: corpus bucket checkpoint (the one corpus scan)
    val e = timed("bucket-checkpoint") {
      val df = e0.select(($"vec_id" +: $"embedding" +:
        (0 until NumTables).map(t =>
          bucketCol($"embedding", t, p).as(s"b$t"))): _*)
        .localCheckpoint(true)
      df.count()
      df
    }

    s.sparkContext.setLogLevel("WARN")
    val proj = e0.select(($"vec_id" +: $"embedding" +: (0 until NumTables).map(t =>
      bucketCol($"embedding", t, p).as(s"b$t"))): _*)
    proj.explain("formatted")
    timed("emb+buckets-noop") {
      proj.write.format("noop").mode("overwrite").save()
    }
    // same but only 1 bucket column materialized
    for (nt <- Seq(1, 2)) timed(s"materialize-nt$nt") {
      e0.select(($"vec_id" +: (0 until nt).map(t =>
        bucketCol($"embedding", t, p).as(s"b$t"))): _*)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
