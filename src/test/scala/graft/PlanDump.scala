package graft

/** Dev probe: dump the executed plan of one query (AQE-final) to stdout. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val s = GraftSession.get("local[8]")
    val df = SparkEntry.queries(name)(s, dir)
    df.write.format("noop").mode("overwrite").save()
    println("=== executed plan ===")
    println(df.queryExecution.executedPlan.toString)
    s.stop()
  }
}
