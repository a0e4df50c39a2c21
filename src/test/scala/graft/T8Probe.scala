package graft

import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: time t8_tfidf variants at sf0.1 (min of 3, noop sink). */
object T8Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = GraftSession.get("local[16]")
    import s.implicits._

    def base(docs: DataFrame) = docs.withColumn("toks", Text.tokens($"text"))
      .select($"doc_id", explode($"toks").as("token"))

    def rank(scored: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"score".desc, $"token")
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 3)
        .select($"doc_id", $"token", $"score", $"rnk")
    }

    // A: current shape (two scans, broadcast df join)
    def vA() = {
      val docs = Tables.documents(s, dir)
      val nDf = docs.agg(count(lit(1)).as("n"))
      val tf = base(docs).groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      rank(tf.join(broadcast(df), "token").crossJoin(broadcast(nDf))
        .withColumn("score", round($"tf" * log(($"n" * lit(1.0)) / $"df"), 6)))
    }

    // B: checkpointed tf (one scan + eager barrier)
    def vB() = {
      val docs = Tables.documents(s, dir)
      val nDf = docs.agg(count(lit(1)).as("n"))
      val tf = base(docs).groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      rank(tf.join(broadcast(df), "token").crossJoin(broadcast(nDf))
        .withColumn("score", round($"tf" * log(($"n" * lit(1.0)) / $"df"), 6)))
    }

    // C: df via window over token (one scan, no join)
    def vC() = {
      val docs = Tables.documents(s, dir)
      val nDf = docs.agg(count(lit(1)).as("n"))
      val tf = base(docs).groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
      val wT = org.apache.spark.sql.expressions.Window.partitionBy($"token")
      rank(tf.withColumn("df", count(lit(1)).over(wT))
        .crossJoin(broadcast(nDf))
        .withColumn("score", round($"tf" * log(($"n" * lit(1.0)) / $"df"), 6)))
    }

    def time(tag: String)(mk: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(f"[t8probe] $tag min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // warm
    time("warmA")(() => vA())
    time("A_reuse2scan")(() => vA())
    time("B_checkpoint")(() => vB())
    time("C_window")(() => vC())
    s.stop()
  }
}
