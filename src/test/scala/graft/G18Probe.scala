package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 forensics for g18_stream_quantile (10.59 s at sf0.1 in
  * BENCH_r10 — the heaviest driver-bench number; round-10 verdict item 1).
  * Decomposes the op into: the hashed-event projection (md5/conv/
  * substring per row), the three staged-batch parquet writes, a
  * one-feeder run (micro-batch overhead), and a per-batch pre-aggregated
  * variant (counts folded before the typed state path), so the fix
  * targets the component that actually pays.
  */
object G18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def best(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    noop(SparkEntry.queries("g18_stream_quantile")(spark, "/root/testdata/sf0.001"))

    val full = best(3)(noop(
      SparkEntry.queries("g18_stream_quantile")(spark, sfDir)))
    println(f"g18 full: $full%.3f s")

    // component: the hashed projection alone
    val grid = expr("CAST(round(value * 10000) AS BIGINT)")
    def ev = sources.Tables.events(spark, sfDir).filter($"value".isNotNull)
      .select($"event_type".as("etype"),
        conv(substring(md5(concat(lit("g18"), grid.cast("string"))), 1, 8),
          16, 10).cast("long").as("hv"),
        grid.as("v"))
    val evT = best(3)(noop(ev))
    println(f"ev projection scan: $evT%.3f s")

    // component: staging writes (coalesce(1) parquet x3, like runFiles)
    val stageT = best(3) {
      val root = java.nio.file.Files.createTempDirectory("g18probe").toString
      ev.filter($"v" % 2 === 0).coalesce(1).write.mode("overwrite").parquet(s"$root/b0")
      ev.filter($"v" % 2 =!= 0).coalesce(1).write.mode("overwrite").parquet(s"$root/b1")
      ev.select($"etype").distinct()
        .select($"etype", lit(-1L).as("hv"), lit(0L).as("v"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/b2")
    }
    println(f"staging 3x parquet: $stageT%.3f s")

    // component: pre-aggregated staging (count per (etype,v) per feeder)
    val agg = sources.Tables.events(spark, sfDir).filter($"value".isNotNull)
      .groupBy($"event_type".as("etype"), grid.as("v")).count()
      .select($"etype",
        conv(substring(md5(concat(lit("g18"), $"v".cast("string"))), 1, 8),
          16, 10).cast("long").as("hv"),
        $"v", $"count".as("c"))
    val aggT = best(3) {
      val root = java.nio.file.Files.createTempDirectory("g18probeA").toString
      agg.filter($"v" % 2 === 0).coalesce(1).write.mode("overwrite").parquet(s"$root/b0")
      agg.filter($"v" % 2 =!= 0).coalesce(1).write.mode("overwrite").parquet(s"$root/b1")
    }
    println(f"pre-agg staging 2x parquet: $aggT%.3f s")
    println(s"agg rows: ${agg.count()}  raw rows: ${ev.count()}")

    // fixed streaming-query overhead: identity transform over the same
    // two staged batches (no state, no typed path)
    val ident = best(3)(noop(streaming.StreamRunner.runFiles(spark,
      Seq(agg.filter($"v" % 2 === 0), agg.filter($"v" % 2 =!= 0)))(df => df)))
    println(f"runFiles identity 2 batches: $ident%.3f s")

    // single-batch identity: per-micro-batch marginal cost
    val ident1 = best(3)(noop(streaming.StreamRunner.runFiles(spark,
      Seq(agg))(df => df)))
    println(f"runFiles identity 1 batch: $ident1%.3f s")

    // the localCheckpoint cost of agg itself
    val lc = best(3)(noop(sources.Tables.events(spark, sfDir)
      .filter($"value".isNotNull)
      .groupBy($"event_type".as("etype"), grid.as("v")).count()
      .localCheckpoint()))
    println(f"agg localCheckpoint: $lc%.3f s")
  }
}
