package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 stage timing of the CURRENT ivfTrain at a given SF (the
  * round-11 IvfStageProbe replays the retired interpreted shapes).
  * Usage: Test/runMain graft.operators.IvfStageProbe2 <sfDir>
  */
object IvfStageProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf10data")
    val s = graft.GraftSession.get("local[32]")
    import s.implicits._
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ivf2] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = t("corpus-ckpt") {
      val x = graft.sources.Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
        .localCheckpoint(true)
      x.count(); x
    }
    val k = Similarity.numCentroids(e.count())
    var cdf: DataFrame = t("seed") {
      e.orderBy($"vec_id").limit(k)
        .select(row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy($"vec_id")).cast("int").minus(1).as("cid"),
          $"emb".as("c_emb"))
        .localCheckpoint(true)
    }
    def assign(codebook: DataFrame): DataFrame = {
      val cents = codebook.orderBy($"cid").collect()
        .map(_.getSeq[Double](1).toArray)
      e.select($"vec_id", graft.functions.Vec.l2ArgMin(cents, $"emb").as("cid"),
        $"emb")
    }
    t("assign0-count")(assign(cdf).count())
    // A/B the two means forms over the SAME assignment, interleaved
    for (r <- 1 to 3) {
      t(s"means-explode-$r") {
        assign(cdf)
          .select($"cid", posexplode($"emb").as(Seq("dim", "x")))
          .groupBy($"cid", $"dim")
          .agg(((sum(floor($"x" * 1e6)).cast("double") / count(lit(1))) / 1e6)
            .as("m")).write.format("noop").mode("overwrite").save()
      }
      t(s"means-ticksum-$r") {
        assign(cdf).groupBy($"cid")
          .agg(graft.functions.TickSumAgg($"emb", Similarity.Dim).as("ts"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    t("final-assign-ckpt") {
      assign(cdf).localCheckpoint(true).count()
    }
    s.stop()
  }
}
