package graft

import org.apache.spark.sql.SparkSession

/** Times d13 (span dedup) at an SF dir — used to record the round-10
  * polynomial-window-hash rewrite against the r9 md5-per-window baseline
  * (~10 s / 50k docs at sf1).
  */
object D13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/sf1data")
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
    noop(operators.Dedup.d13(spark, "/root/testdata/sf0.001")) // warm shapes
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      noop(operators.Dedup.d13(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      t
    }
    println(f"d13 @ $sfDir: min ${times.min}%.2f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
