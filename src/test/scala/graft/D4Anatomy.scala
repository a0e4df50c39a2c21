package graft

import org.apache.spark.sql.functions._

/** d4 stage decomposition at an SF dir: signature kernel, probe build,
  * candidate join, verify+distinct — plus a no-carried-sigs variant that
  * re-attaches signatures by id after the equi-join.
  */
object D4Anatomy {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf10data"
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import operators.Dedup
    import graft.functions.SimHash
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sigs = t("signatures+checkpoint") {
      val x = Dedup.simhashes(s, dir).localCheckpoint(true)
      println(s"  docs: ${x.count()}")
      x
    }
    val radius = Dedup.SimHashMaxHamming
    t("d4 pairs (carried sigs)") {
      Dedup.simhashPairs(sigs, radius)
        .write.format("noop").mode("overwrite").save()
    }
    // variant: skinny probes, sigs re-attached by id post-distinct
    t("d4 pairs (reattach)") {
      val blocks = SimHash.mihBlocks(radius)
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
        .select($"doc_id", $"bi",
          $"blk.bv".bitwiseXOR($"mask").as("probe"))
      val a = probes.toDF("a_id", "bi", "probe")
      val b = probes.toDF("b_id", "bi2", "probe2")
      val cand = a.join(b,
          $"bi" === $"bi2" && $"probe" === $"probe2" && $"a_id" < $"b_id")
        .select($"a_id", $"b_id").distinct()
      val sa = sigs.select($"doc_id".as("a_id"),
        $"h1".as("a_h1"), $"h2".as("a_h2"), $"h3".as("a_h3"), $"h4".as("a_h4"))
      val sb = sigs.select($"doc_id".as("b_id"),
        $"h1".as("b_h1"), $"h2".as("b_h2"), $"h3".as("b_h3"), $"h4".as("b_h4"))
      val hamming = (1 to SimHash.Halves)
        .map(i => expr(s"bit_count(a_h$i ^ b_h$i)")).reduce(_ + _).cast("long")
      cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("hamming", hamming)
        .filter($"hamming" <= radius)
        .select($"a_id", $"b_id", $"hamming")
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
