package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** Dev probe: per-stage timing of d4 at a given SF — signature aggregation
  * vs MIH candidate join vs verify — to target optimization.
  */
object D4Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get("local[32]")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warmup
    s.read.parquet(s"$d/documents.parquet").count()
    for (i <- 1 to 4) {
      time(s"[$i] simhashes (sig agg only)")(Dedup.simhashes(s, d))
      val sigs = Dedup.simhashes(s, d).localCheckpoint(true)
      time(s"[$i] candidates (join only)")(
        Dedup.simhashCandidates(sigs, Dedup.SimHashMaxHamming))
      time(s"[$i] full d4")(Dedup.d4(s, d))
    }
    val sigs = Dedup.simhashes(s, d).localCheckpoint(true)
    val n = sigs.count()
    val c = Dedup.simhashCandidates(sigs, Dedup.SimHashMaxHamming).count()
    println(s"  docs=$n candidates=$c allPairs=${n * (n - 1) / 2} " +
      f"frac=${c.toDouble / (n * (n - 1) / 2)}%.5f")
    s.stop()
  }
}
