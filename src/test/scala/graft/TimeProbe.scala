package graft

import org.apache.spark.sql.SparkSession

/** Times any SparkEntry query min-of-3 in a bench-identical session:
  * `Test/runMain graft.TimeProbe <sfDir> <query> [query ...]`.
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .withExtensions(new functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      noop(fn(spark, "/root/testdata/sf0.001")) // warm the shape
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        t
      }
      println(f"$name @ $sfDir: min ${times.min}%.2f s (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
