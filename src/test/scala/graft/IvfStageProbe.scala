package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11: per-stage timing of the distributed-Lloyd ivfTrain at a
  * given SF dir, to localize the sf10 regression the round-10-final
  * commit introduced.
  */
object IvfStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import operators.Similarity
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val e = t("corpus") {
      val x = graft.sources.Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
        .localCheckpoint(true)
      x.count(); x
    }
    val k = Similarity.numCentroids(e.count())
    println(s"STAGE k=$k")
    val cdf0 = t("seed") {
      e.orderBy($"vec_id").limit(k)
        .select(row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy($"vec_id")).cast("int").minus(1).as("cid"),
          $"emb".as("c_emb"))
        .localCheckpoint(true)
    }
    def assign(codebook: DataFrame): DataFrame = {
      val dist2 = aggregate(
        zip_with($"emb", $"c_emb", (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
      e.crossJoin(broadcast(codebook))
        .withColumn("d2", dist2)
        .groupBy($"vec_id")
        .agg(min(struct($"d2", $"cid")).getField("cid").as("cid"),
          first($"emb").as("emb"))
    }
    val a0 = t("assign0.count") { assign(cdf0).count() }
    println(s"  assigned: $a0")
    val means = assign(cdf0)
      .select($"cid", posexplode($"emb").as(Seq("dim", "x")))
      .groupBy($"cid", $"dim")
      .agg(((sum(floor($"x" * 1e6)).cast("double") / count(lit(1))) / 1e6)
        .as("m"))
    t("means.count") { println(s"  means: ${means.count()}") }
    val folded = cdf0
      .select($"cid", posexplode($"c_emb").as(Seq("dim", "x0")))
      .join(means, Seq("cid", "dim"), "left_outer")
      .groupBy($"cid")
      .agg(transform(array_sort(collect_list(
          struct($"dim", coalesce($"m", $"x0").as("x")))),
        p => p.getField("x")).as("c_emb"))
    println("=== folded plan ===")
    folded.explain("formatted")
    val cdf1 = t("fold.checkpoint") { folded.localCheckpoint(true) }
    t("assign1.count") { println(assign(cdf1).count()) }
    s.stop()
  }
}
