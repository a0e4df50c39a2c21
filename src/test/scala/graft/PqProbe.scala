package graft

import graft.operators.Similarity

/** Dev probe: PQ index build / query / streaming-encode timings. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf1data"
    val s = GraftSession.get("local[32]")
    // warm codegen at the small SF
    Similarity.s6(s, "/root/testdata/sf0.001").write.format("noop")
      .mode("overwrite").save()
    val t0 = System.nanoTime()
    val (e, codes, cents) = Similarity.pqIndex(s, dir)
    println(f"[pqprobe] build=${(System.nanoTime() - t0) / 1e9}%.3f")
    for (i <- 1 to 3) {
      val t1 = System.nanoTime()
      Similarity.s6Query(s, e, codes, cents).write.format("noop")
        .mode("overwrite").save()
      println(f"[pqprobe] query$i=${(System.nanoTime() - t1) / 1e9}%.3f")
    }
    val t2 = System.nanoTime()
    streaming.StreamOps.g11Encode(s, e, cents).write.format("noop")
      .mode("overwrite").save()
    println(f"[pqprobe] g11encode=${(System.nanoTime() - t2) / 1e9}%.3f")
    s.stop()
  }
}
