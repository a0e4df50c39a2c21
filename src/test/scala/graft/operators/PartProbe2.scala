package graft.operators
object PartProbe2 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.get("local[32]")
    for (t <- Seq("documents", "events", "lineitem", "orders", "embeddings")) {
      val df = s.read.parquet(s"/root/repo/sf10data/$t.parquet")
      val parts = df.rdd.getNumPartitions
      // rows per partition: skew visible as max >> avg
      val sizes = df.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
      println(s"[part2] $t: parts=$parts rows max=${sizes.max} avg=${sizes.sum / sizes.length}")
    }
    s.stop()
  }
}
