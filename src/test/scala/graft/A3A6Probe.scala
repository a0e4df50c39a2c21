package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 bench forensics for the a3/a6 regression in BENCH_r09 (a3
  * 0.43->1.81 s, a6 0.24->1.33 s vs r7 while other headliners held).
  * Times the two queries min-of-5 in a bench-identical session, then
  * decomposes the events read path: raw scan, dtype-dispatched loader,
  * and the downstream shapes (window fold for a3's workload, the a6
  * aggregate) so the regression can be pinned to scan vs cast vs fold.
  */
object A3A6Probe {
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

    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    println(s"events raw schema: ${raw.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    println(s"events rows: ${raw.count()}")

    def best(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm at sf0.001 like Bench does
    val warm = "/root/testdata/sf0.001"
    noop(SparkEntry.queries("a3_txn_conditional_state")(spark, warm))
    noop(SparkEntry.queries("a6_event_time_sort")(spark, warm))

    val a3 = best(5)(noop(SparkEntry.queries("a3_txn_conditional_state")(spark, sfDir)))
    val a6 = best(5)(noop(SparkEntry.queries("a6_event_time_sort")(spark, sfDir)))
    println(f"a3 min5: $a3%.3f s   a6 min5: $a6%.3f s")

    // decomposition
    val scanRaw = best(5)(noop(raw))
    val scanLoader = best(5)(noop(sources.Tables.events(spark, sfDir)))
    val wl = best(5)(noop(operators.TxnQueries.workload(spark, sfDir).toDF()))
    println(f"raw scan: $scanRaw%.3f  loader scan: $scanLoader%.3f  a3 workload(window): $wl%.3f")

    // a6 without the loader cast: run the same aggregate over the raw frame
    val ts = raw.schema("ts").dataType.simpleString
    val rawTs = if (ts == "bigint")
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))) else raw
    val a6raw = best(5)(noop(
      rawTs.groupBy($"user_id").agg(count(lit(1)).as("n"),
        array_join(transform(sort_array(collect_list(struct($"ts", $"event_id"))),
          x => x.getField("event_id").cast("string")), ",").as("seq"))))
    println(f"a6 over raw(no-cast): $a6raw%.3f")
    spark.stop()
  }
}
