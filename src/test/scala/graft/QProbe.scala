package graft

/** Ad-hoc per-query timing probe: warm each named gate query at
  * sf0.001, then run it 3× against the given dir and print min + all
  * samples. Used to separate host-load noise from real regressions
  * (e.g. round 11: the loaded-host sf10 run showed q5 at 29.7 s; this
  * probe on the quiet host reproduced 6.4 s, pinning the delta on the
  * environment, not the plan).
  *
  * Usage: Test/runMain graft.QProbe <sfDir> <queryName>...
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = GraftSession.get("local[32]")
    val names = args.drop(1)
    // same knob Bench uses; skip warming (loudly) when the fixture dir
    // is absent rather than failing by hardcoded path
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val warm = new java.io.File(warmDir).isDirectory
    if (!warm) System.err.println(s"QProbe: warm dir $warmDir missing; cold runs")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (warm)
        fn(s, warmDir).write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(s, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n: min=${times.min}%.3f times=${times.map(t => f"$t%.2f").mkString(",")}")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    s.stop()
  }
}
