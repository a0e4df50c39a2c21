package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interleaved A/B timing of the OLD d4 verify (probe self-join +
  * Hamming filter) vs the NEW one (repartition + sorted streaming
  * bucket pair loop) in one session — the shared host's load swings are
  * too large for cross-run comparisons (the same signature kernel
  * measured 15.6 s and 114 s in different runs).
  */
object D4AB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import operators.Dedup
    import graft.functions.SimHash
    val radius = Dedup.SimHashMaxHamming
    val sigs = Dedup.simhashes(s, dir).localCheckpoint(true)
    println(s"docs: ${sigs.count()}")

    def oldPairs(): DataFrame = {
      val blocks = SimHash.mihBlocks(radius)
      val blkCols = blocks.zipWithIndex.map { case ((lo, w), i) =>
        struct(lit(i).as("bi"),
          SimHash.blockVal(h => col(s"h${h + 1}"), lo, w).as("bv"))
      }
      val masks = blocks.zipWithIndex.flatMap { case ((_, w), i) =>
        SimHash.symProbeMasks(w).map(m => (i, m))
      }
      val probes = sigs
        .select($"doc_id", $"h1", $"h2", $"h3", $"h4",
          explode(array(blkCols: _*)).as("blk"))
        .join(broadcast(masks.toDF("bi", "mask")), $"blk.bi" === $"bi")
        .select($"doc_id", $"h1", $"h2", $"h3", $"h4", $"bi",
          $"blk.bv".bitwiseXOR($"mask").as("probe"))
      val a = probes.toDF("a_id", "a_h1", "a_h2", "a_h3", "a_h4", "bi", "probe")
      val b = probes.toDF("b_id", "b_h1", "b_h2", "b_h3", "b_h4", "bi2", "probe2")
      val hamming = (1 to SimHash.Halves)
        .map(i => expr(s"bit_count(a_h$i ^ b_h$i)")).reduce(_ + _).cast("long")
      a.join(b, $"bi" === $"bi2" && $"probe" === $"probe2" && $"a_id" < $"b_id")
        .withColumn("hamming", hamming)
        .filter($"hamming" <= radius)
        .select($"a_id", $"b_id", $"hamming")
        .distinct()
    }

    def t(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name $sec%.1f s")
      sec
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val reps = 2
    val times = (1 to reps).flatMap { _ =>
      val tNew = t("NEW sorted-bucket pairs")(
        noop(Dedup.simhashPairs(sigs, radius)))
      val tOld = t("OLD self-join pairs   ")(noop(oldPairs()))
      Seq(("new", tNew), ("old", tOld))
    }
    val bn = times.filter(_._1 == "new").map(_._2).min
    val bo = times.filter(_._1 == "old").map(_._2).min
    println(f"BEST new=$bn%.1f s  old=$bo%.1f s  speedup=${bo / bn}%.2fx")
    s.stop()
  }
}
