package graft.operators
object PartProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.get("local[32]")
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(s, "/root/repo/sf10data")
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    println("[part] scan partitions: " + e.rdd.getNumPartitions)
    val ck = e.localCheckpoint(true)
    println("[part] checkpoint partitions: " + ck.rdd.getNumPartitions)
    val k = Similarity.numCentroids(ck.count())
    val cents = Array.tabulate(k, Similarity.Dim)((c, j) => (c * 64 + j) / 1e4)
    def t[A](n: String)(b: => A): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime(); b
        println(f"[part] $n-$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    t("argmin-only")(ck.select($"vec_id",
      graft.functions.Vec.l2ArgMin(cents, $"emb").as("cid"))
      .write.format("noop").mode("overwrite").save())
    t("emb-carry")(ck.select($"vec_id", $"emb")
      .write.format("noop").mode("overwrite").save())
    t("assign-full")(ck.select($"vec_id",
      graft.functions.Vec.l2ArgMin(cents, $"emb").as("cid"), $"emb")
      .write.format("noop").mode("overwrite").save())
    t("ticksum-by-cid")(ck.select(
      graft.functions.Vec.l2ArgMin(cents, $"emb").as("cid"), $"emb")
      .groupBy($"cid")
      .agg(graft.functions.TickSumAgg($"emb", Similarity.Dim).as("ts"))
      .write.format("noop").mode("overwrite").save())
    t("explode-by-cid")(ck.select(
      graft.functions.Vec.l2ArgMin(cents, $"emb").as("cid"), $"emb")
      .select($"cid", posexplode($"emb").as(Seq("dim", "x")))
      .groupBy($"cid", $"dim")
      .agg(((sum(floor($"x" * 1e6)).cast("double") / count(lit(1))) / 1e6).as("m"))
      .write.format("noop").mode("overwrite").save())
    val ck32 = e.repartition(32).localCheckpoint(true)
    ck32.count()
    t("argmin32-only")(ck32.select($"vec_id",
      graft.functions.Vec.l2ArgMin(cents, $"emb").as("cid"))
      .write.format("noop").mode("overwrite").save())
    t("ticksum32-by-cid")(ck32.select(
      graft.functions.Vec.l2ArgMin(cents, $"emb").as("cid"), $"emb")
      .groupBy($"cid")
      .agg(graft.functions.TickSumAgg($"emb", Similarity.Dim).as("ts"))
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
