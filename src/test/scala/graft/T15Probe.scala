package graft

import org.apache.spark.sql.functions._

/** Dev probe: decompose t15's wall time into the tokenize scan vs the
  * per-lang packing window (SURVEY §6's sf1 named-cause evidence).
  * Usage: runMain graft.T15Probe <sfDir>
  */
object T15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    import s.implicits._
    def timed(label: String)(body: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"T15PROBE $label $best%.3f s")
    }
    val docs = sources.Tables.documents(s, dir)
    timed("tokenize_scan") {
      docs.select($"doc_id", $"lang",
          size(functions.Text.tokens($"text")).cast("long").as("n_tokens"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("t15_full") {
      operators.TextOps.t15(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // window-only: same shape on a pre-materialized token-count table
    val counts = docs.select($"doc_id", $"lang",
        size(functions.Text.tokens($"text")).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    timed("window_only") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      counts.withColumn("cum", sum($"n_tokens").over(w))
        .select($"doc_id", $"lang", $"n_tokens",
          floor(($"cum" - $"n_tokens") / lit(operators.TextOps.PackBin.toDouble))
            .cast("long").as("bin"),
          (($"cum" - $"n_tokens") % operators.TextOps.PackBin).as("bin_offset"))
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
