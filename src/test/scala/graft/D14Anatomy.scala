package graft

import org.apache.spark.sql.functions._

/** Stage anatomy for d14 (dev probe): times each component of the Bloom
  * prefilter separately to locate the residual cost at sf10.
  * Usage: Test/runMain graft.D14Anatomy [sfDir]
  */
object D14Anatomy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf10data")
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import graft.functions.Text
    import graft.operators.Dedup

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[d14a] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def shOf(f: org.apache.spark.sql.Column) =
      graft.sources.Tables.documents(s, dir).filter(f)
        .withColumn("toks", Text.tokens($"text"))
        .select($"doc_id", explode(Text.shingles($"toks", 5)).as("sh"))
        .select($"doc_id", md5($"sh").as("mh"))

    // warm
    graft.sources.Tables.documents(s, dir).agg(count(lit(1))).collect()

    timed("tokenize+shingle+md5 train (count only)")(
      shOf($"doc_id" % 10 =!= 0).agg(count(lit(1))).collect())
    timed("tokenize+shingle+md5 test (count only)")(
      shOf($"doc_id" % 10 === 0).agg(count(lit(1))).collect())
    val trainMh = timed("trainMh checkpoint")(
      shOf($"doc_id" % 10 =!= 0).select($"mh").localCheckpoint(true))
    println(s"[d14a] train grams: ${trainMh.count()}")
    def posCols(mh: org.apache.spark.sql.Column) =
      (0 until Dedup.BloomK).map(j =>
        conv(substring(mh, 8 * j + 1, 8), 16, 10).cast("long") % Dedup.BloomBits)
    val positions = timed("positions distinct+collect")(
      trainMh.select(explode(array(posCols($"mh"): _*)).as("pos"))
        .distinct().as[Long].collect())
    println(s"[d14a] positions: ${positions.length}")
    def base = shOf($"doc_id" % 10 === 0)
      .withColumn("maybe", graft.functions.BloomProbe(
        positions, Dedup.BloomK, Dedup.BloomBits, $"mh"))
    timed("totals agg")(
      base.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"maybe", 1L).otherwise(0L)).as("bloom_hits"))
        .write.format("noop").mode("overwrite").save())
    timed("exact semi join")(
      base.filter($"maybe").join(trainMh, Seq("mh"), "left_semi")
        .groupBy($"doc_id").agg(count(lit(1)).as("exact_hits"))
        .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
