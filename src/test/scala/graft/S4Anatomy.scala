package graft

import org.apache.spark.sql.functions._

/** Dev probe: time each stage of s4's plan separately at a given SF dir
  * to locate decade-up spill sources (round 13: sf100 filled the disk).
  * Usage: runMain graft.S4Anatomy <sfDir> [step...]
  * steps: buckets same near nearscored agg full
  */
object S4Anatomy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.drop(1).toSet
                else Set("buckets", "same", "near", "agg")
    val s = GraftSession.get(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    s.sparkContext.setLogLevel("INFO")
    import s.implicits._
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"S4A $name sec=${(System.nanoTime() - t0) / 1e9}%.1f -> $r")
      r
    }
    val emb = sources.Tables.embeddings(s, dir)
    val planes = operators.Dedup.d5Planes(emb.count())
    val e = operators.Dedup.d5BucketsOf(
      emb.select($"vec_id", $"embedding"), planes)
    if (which("buckets"))
      timed("buckets")(e.count())
    val sb = e.select($"vec_id", $"bucket", $"embedding")
    if (which("same")) {
      val same = sb.toDF("a_id", "bkt", "a_emb")
        .join(sb.toDF("b_id", "bkt2", "b_emb"),
          $"bkt" === $"bkt2" && $"a_id" < $"b_id")
        .select($"a_id", $"b_id",
          round(functions.Vec.cosineFast($"a_emb", $"b_emb"), 6).as("cos"))
      timed("same_count")(same.count())
      timed("same_agg")(same
        .groupBy($"a_id").agg(max($"cos")).count())
    }
    if (which("near"))
      timed("near_count")(
        operators.Dedup.nearCandidatesOf(e, planes).count())
    if (which("agg") || which("full"))
      timed("full_s4")(operators.Similarity.s4(s, dir).write
        .format("noop").mode("overwrite").save())
    s.stop()
  }
}
