package graft.operators
object S8BuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf10data")
    val s = graft.GraftSession.get("local[32]")
    // warm
    Similarity.s8Index(s, "/root/testdata/sf0.001")
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val (_, _, codes, _) = Similarity.s8Index(s, dir)
      codes.count()
      println(f"[s8build] run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val t0 = System.nanoTime()
    val (_, cents, assigned) = Similarity.ivfTrain(s, dir)
    assigned.count()
    println(f"[s8build] ivfTrain alone: ${(System.nanoTime() - t0) / 1e9}%.2f s (k=${cents.length})")
    s.stop()
  }
}
