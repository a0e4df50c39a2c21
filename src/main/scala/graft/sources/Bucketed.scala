package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** First-class co-partitioned fact layout: bucketed+sorted copies of
  * orders and lineitem on the order key, built once per SF dir and shared
  * by every orderkey fact-fact join in the process (h5, q60, probes).
  *
  * Why this exists as a library path and not just inside h5: the round-13
  * sf100 probe identified q5's raw fact-fact SMJ shuffle as the
  * single-box I/O coupler (docs/SF100_r13.md), and Q5BucketProbe measured
  * the fix — the 32-bucket layout runs the same join 2.7× faster at sf10
  * (8.64 → 3.18 s), drops the exchanges feeding the join from 7 to 5
  * (both removed exchanges are the fact shuffles), and collapses run
  * variance 21 s → 0.9 s because the variance WAS the shuffle
  * (docs/Q5BUCKET_r13.md). At 100 TB the prescription is: keep the fact
  * tables bucketed on their join key at ingest; q5-class queries then
  * neither shuffle nor couple. The one-time write amortizes after ~14
  * q5-shaped queries and every orderkey join shares it.
  *
  * Bucket metadata only survives through the catalog, so the copies are
  * `saveAsTable` tables with per-process-unique names (two sessions
  * sharing a metastore must not race on DROP/saveAsTable); [[clear]]
  * drops them, and a shutdown hook covers processes that exit without
  * clearing.
  */
object Bucketed {
  /** 32 = one bucket per local core; at cluster scale the same layout
    * rule is buckets ≈ executors × cores-per-executor (the bucket is the
    * unit of join parallelism — too few starves the SMJ, too many makes
    * small files; h7's compaction policy is the file-size guard).
    */
  val NumBuckets = 32

  /** Write the bucketed+sorted copies (uncached — callers that want the
    * shared layout use [[factTables]]); returns (orders table, lineitem
    * table, cleanup).
    */
  private[graft] def setup(s: SparkSession, dir: String,
      buckets: Int = NumBuckets): (String, String, () => Unit) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed_")
      .toString
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val (to, tl) = (s"bkt_orders_$tag", s"bkt_lineitem_$tag")
    Tables.orders(s, dir).write.mode("overwrite")
      .option("path", s"$wh/o")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
    Tables.lineitem(s, dir).write.mode("overwrite")
      .option("path", s"$wh/l")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
    val cleanup = () => {
      // DROPs may run on the shutdown-hook path after Spark has stopped;
      // the files must go regardless (the catalog dies with the JVM)
      try {
        s.sql(s"DROP TABLE IF EXISTS $to")
        s.sql(s"DROP TABLE IF EXISTS $tl")
      } catch { case _: Throwable => () }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(wh))
    }
    (to, tl, cleanup)
  }

  private val cache = scala.collection.concurrent.TrieMap
    .empty[String, (String, String, () => Unit)]

  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try clear() catch { case _: Throwable => () }))

  /** The shared per-dir layout's (orders, lineitem) table names, building
    * on first use. Race-safe: putIfAbsent decides the winner and the
    * loser drops its own copy (TrieMap.getOrElseUpdate is not atomic for
    * a side-effecting setup).
    */
  def factTables(s: SparkSession, dir: String): (String, String) = {
    cleanupHook
    val (to, tl, _) = cache.get(dir).getOrElse {
      val fresh = setup(s, dir)
      cache.putIfAbsent(dir, fresh) match {
        case Some(winner) => fresh._3(); winner
        case None => fresh
      }
    }
    (to, tl)
  }

  /** The co-partitioned orders copy (bucketed+sorted on o_orderkey). */
  def orders(s: SparkSession, dir: String): DataFrame =
    s.table(factTables(s, dir)._1)

  /** The co-partitioned lineitem copy (bucketed+sorted on l_orderkey). */
  def lineitem(s: SparkSession, dir: String): DataFrame =
    s.table(factTables(s, dir)._2)

  /** Drop every cached layout (bench/gate end-of-run hygiene). */
  def clear(): Unit = {
    cache.values.foreach { case (_, _, cleanup) =>
      try cleanup() catch { case _: Throwable => () }
    }
    cache.clear()
  }
}
