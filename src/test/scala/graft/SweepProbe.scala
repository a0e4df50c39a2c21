package graft

/** Incremental full-inventory sweep: run the named gate queries against
  * an SF dir (min over SPARK_GRAFT_REPS, default 1) and APPEND one
  * `name<TAB>seconds` line per query to the output file as soon as it
  * finishes — so a decade-SF sweep that dies mid-run (OOM, disk) keeps
  * everything measured so far, and chunks can run in separate JVMs (the
  * round-13 sections lesson: one giant JVM lifetime at sf100 makes late
  * queries measure the early ones' GC).
  *
  * Usage: Test/runMain graft.SweepProbe <sfDir> <outFile> <query>...
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val (dir, out) = (args(0), args(1))
    val names = args.drop(2)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val s = GraftSession.get("local[32]")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val warm = new java.io.File(warmDir).isDirectory
    def append(line: String): Unit = {
      val w = new java.io.FileWriter(out, true)
      try w.write(line + "\n") finally w.close()
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try {
        if (warm) fn(s, warmDir).write.format("noop").mode("overwrite").save()
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(s, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        append(f"$n\t${times.min}%.2f")
      } catch {
        case scala.util.control.NonFatal(e) =>
          append(s"$n\tFAIL\t${String.valueOf(e.getMessage).take(200)}")
      }
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    streaming.StreamRunner.clearStagedCache()
    sources.Roundtrip.clearFragmentedCache()
    s.stop()
  }
}
