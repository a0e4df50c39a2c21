package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B: d14's eager 90M-row grams localCheckpoint vs a lazy plan that
  * lets ReuseExchange serve the three grams consumers (bloom positions,
  * exact train set, test probe) from ONE shuffle write — t8's pattern.
  *
  * MEASURED AND REJECTED (round 12, sf10, interleaved min-of-3): eager
  * 31.9 s vs lazy 32.1 s, identical results — ReuseExchange already
  * serves the branches from one shuffle, so the checkpoint write costs
  * what the reuse read saves. d14's ~32-40 s at sf10 is genuine work
  * (100M shingle md5s + a 90M-row (doc, gram) aggregate + a 90M-row
  * distinct + the probe joins), not a plan defect. The eager checkpoint
  * stays: it also pins the frame against AQE replanning the subtree
  * differently per consumer.
  *
  * Usage: Test/runMain graft.operators.D14AB <sfDir>
  */
object D14AB {
  private def d14Of(s: SparkSession, dir: String, eager: Boolean): DataFrame = {
    import s.implicits._
    import graft.functions.Text
    import graft.sources.Tables
    val sh = Tables.documents(s, dir)
      .withColumn("toks", Text.tokens($"text"))
      .select($"doc_id", explode(Text.shingles($"toks", 5)).as("sh"))
      .select($"doc_id", md5($"sh").as("mh"))
    val gramsBase = sh.groupBy($"doc_id", $"mh")
      .agg(count(lit(1)).cast("long").as("c"))
    val grams = if (eager) gramsBase.localCheckpoint(true) else gramsBase
    def posCols(mh: Column): Seq[Column] = (0 until Dedup.BloomK).map(j =>
      conv(substring(mh, 8 * j + 1, 8), 16, 10).cast("long") % Dedup.BloomBits)
    val bloom = grams.filter($"doc_id" % 10 =!= 0)
      .select(explode(array(posCols($"mh"): _*)).as("pos")).distinct()
      .withColumn("set", lit(1))
    val trainSet = grams.filter($"doc_id" % 10 =!= 0)
      .select($"mh").distinct().withColumn("intrain", lit(1))
    val test = grams.filter($"doc_id" % 10 === 0)
    val probed = test
      .select($"doc_id", $"mh", $"c",
        explode(array(posCols($"mh"): _*)).as("pos"))
      .join(bloom, Seq("pos"), "left_outer")
      .groupBy($"doc_id", $"mh", $"c")
      .agg((count($"set") === Dedup.BloomK).as("maybe"))
      .join(trainSet, Seq("mh"), "left_outer")
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"),
        sum(when($"maybe", $"c").otherwise(0L)).as("bloom_hits"),
        sum(when($"intrain".isNotNull, $"c").otherwise(0L)).as("exact_hits"))
    Tables.documents(s, dir).filter($"doc_id" % 10 === 0).select($"doc_id")
      .join(probed, Seq("doc_id"), "left_outer")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).cast("long").as("n_grams"),
        coalesce($"bloom_hits", lit(0L)).cast("long").as("bloom_hits"),
        coalesce($"exact_hits", lit(0L)).cast("long").as("exact_hits"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf10data")
    val s = graft.GraftSession.get("local[32]")
    // warm
    d14Of(s, "/root/testdata/sf0.001", eager = true)
      .write.format("noop").mode("overwrite").save()
    d14Of(s, "/root/testdata/sf0.001", eager = false)
      .write.format("noop").mode("overwrite").save()
    // interleaved min-of-3 each
    for (label <- Seq("eager", "lazy", "eager", "lazy", "eager", "lazy")) {
      val t0 = System.nanoTime()
      d14Of(s, dir, label == "eager")
        .write.format("noop").mode("overwrite").save()
      println(f"[d14ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    // result equality
    val a = d14Of(s, dir, eager = true)
    val b = d14Of(s, dir, eager = false)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[d14ab] diff rows: $diff")
    s.stop()
  }
}
