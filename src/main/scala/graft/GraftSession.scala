package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults sized for the test harness (`local[32]`, 32 shuffle
  * partitions); on a real cluster the same code runs with AQE choosing
  * partition counts (`spark.sql.adaptive.*` stays on either way).
  */
object GraftSession {
  def builder(master: String = "local[32]"): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new functions.GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long ns and let
      // Tables.events lower to µs (truncating, matching DuckDB's read).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
