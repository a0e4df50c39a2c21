package graft

import org.apache.spark.sql.functions._

/** Round-11 d4 forensics at sf10: counts the probe multiset, the raw
  * candidate multiset (with per-(block, mask-split) multiplicity), the
  * distinct candidate pairs, and the verified pairs — so the 30-140 s
  * cost can be attributed to shuffle volume vs join fan-out vs
  * real-output density before tuning block/probe shape.
  */
object D4Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import operators.Dedup
    import graft.functions.SimHash
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sigs = t("signatures+checkpoint") {
      val x = Dedup.simhashes(s, dir).localCheckpoint(true)
      println(s"  docs: ${x.count()}")
      x
    }
    val radius = Dedup.SimHashMaxHamming
    val blocks = SimHash.mihBlocks(radius)
    println(s"  blocks: ${blocks.map(_._2).mkString(",")}")
    val blkCols = blocks.zipWithIndex.map { case ((lo, w), i) =>
      struct(lit(i).as("bi"),
        SimHash.blockVal(h => col(s"h${h + 1}"), lo, w).as("bv"))
    }
    val masks = blocks.zipWithIndex.flatMap { case ((_, w), i) =>
      SimHash.symProbeMasks(w).map(m => (i, m))
    }
    val probes = sigs
      .select($"doc_id", explode(array(blkCols: _*)).as("blk"))
      .join(broadcast(masks.toDF("bi", "mask")), $"blk.bi" === $"bi")
      .select($"doc_id", $"bi", $"blk.bv".bitwiseXOR($"mask").as("probe"))
      .localCheckpoint(true)
    t("probe rows") { println(s"  n: ${probes.count()}") }
    // raw candidate multiset size WITHOUT materializing it: sum over
    // (bi, probe) buckets of n*(n-1)/2
    t("bucket census -> raw cands") {
      val r = probes.groupBy($"bi", $"probe").agg(count(lit(1)).as("n"))
        .agg(sum($"n" * ($"n" - 1) / 2), max($"n"), count(lit(1))).head()
      println(s"  rawPairRows(incl mult, a<b half): ${r.get(0)}  maxBucket: ${r.get(1)}  buckets: ${r.get(2)}")
    }
    t("verified pairs (full d4)") {
      println(s"  pairs: ${Dedup.simhashPairs(sigs, radius).count()}")
    }
  }
}
