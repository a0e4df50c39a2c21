package graft
object Q43Peek {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("local[8]")
    for (dir <- Seq("/root/repo/sf10data", "/root/repo/sf100data")) {
      val df = SparkEntry.queries("q43_market_share")(s, dir)
      println(s"===== q43 @ $dir")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join"))
        .map(_.trim.take(110)).mkString("\n"))
    }
    s.stop()
  }
}
