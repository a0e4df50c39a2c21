package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes t2's per-row cost at an SF dir: scan, regex-normalize,
  * tokenize, stopword HOF, punct regex — to find the hot kernel.
  */
object T2Anatomy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/sf1data")
    val spark = SparkSession.builder()
      .withExtensions(new functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min ${times.min}%.2f s")
    }
    val docs = sources.Tables.documents(spark, sfDir)
    t("scan+length")(docs.select($"doc_id", length($"text")))
    t("norm regex")(docs.select($"doc_id",
      length(regexp_replace(lower($"text"), "[^a-z0-9]+", " "))))
    t("tokens+size")(docs.select($"doc_id", size(graft.functions.Text.tokens($"text"))))
    t("punct regex single")(docs.select($"doc_id",
      length(regexp_replace($"text", "[^a-zA-Z0-9 ]", ""))))
    t("punct regex greedy")(docs.select($"doc_id",
      length(regexp_replace($"text", "[^a-zA-Z0-9 ]+", ""))))
    val toks = docs.select($"doc_id", graft.functions.Text.tokens($"text").as("toks"))
      .localCheckpoint(true)
    toks.count()
    t("stopwords HOF (cached toks)")(toks.select($"doc_id",
      graft.functions.Text.stopwordHits($"toks", graft.functions.Text.enStops)))
    t("shingles HOF (cached toks)")(toks.select($"doc_id",
      size(graft.functions.Text.shingles($"toks"))))
    t("arrays_distinct of shingles")(toks.select($"doc_id",
      size(array_distinct(graft.functions.Text.shingles($"toks")))))
    spark.stop()
  }
}
