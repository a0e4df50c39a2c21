package graft

/** Dev tool: print the physical-plan skeleton (exchanges, joins, scans,
  * codegen spans) of the queries named on the command line at sf0.01 —
  * the quick `.explain` audit the build loop uses before PLANS.md
  * regeneration.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val s = GraftSession.get("local[8]")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    for (n <- names) {
      val df = SparkEntry.queries(n)(s, dir)
      println(s"===== $n")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Scan parquet") || l.contains("WholeStageCodegen"))
        .mkString("\n"))
    }
    s.stop()
  }
}
