package graft

/** Round-11: times ivfTrain (the s3/s8 IVF build) stage by stage at a
  * given SF dir — added when the round-10-final distributed-Lloyd commit
  * turned out to be unbenchmarked at sf10 (RecallProbe sat >18 min in
  * s3 construction).
  */
object IvfTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val s = GraftSession.get("local[32]")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"IVF $name%-14s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val (e, cents, assigned) = t("train") {
      graft.operators.Similarity.ivfTrain(s, dir)
    }
    println(s"IVF k=${cents.length} assigned=${t("assignCount")(assigned.count())}")
    t("s3Query") {
      graft.operators.Similarity.s3(s, dir)
        .write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
