package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q40 vs AQE skew handling (round-12 verdict item 3): the Skew.saltedJoin
  * scaladoc claims the 100 TB skew story, but the utility had never been
  * raced against Spark's own answer (AQE's skew-join splitter) on an
  * ACTUALLY skewed workload — the q40 gate fixture duplicates the part
  * side 8×, which stresses the shuffle, not a hot key.
  *
  * Workload here: lineitem with ONE hot partkey carrying 10% of all rows
  * (the A13SkewProbe recipe), joined to the unduplicated part table and
  * materialized through a noop sink. Auto-broadcast is disabled for every
  * variant: at these SFs part would broadcast and no skew would reach any
  * exchange — at 100 TB the dim side routinely exceeds driver/executor
  * broadcast budgets, and the shuffled join is the case the utility
  * exists for. Variants, min-of-3 each, same host, same JVM:
  *   1. plain join, AQE on  (skewJoin splitter enabled — Spark's answer)
  *   2. plain join, AQE off (the unmitigated baseline: one task inherits
  *      the hot key's full mass)
  *   3. Skew.saltedJoin salt=32, AQE on (the manual mitigation)
  * All three must produce the same row count.
  *
  * Usage: Test/runMain graft.Q40AqeProbe [sfDir]
  */
object Q40AqeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf10data")
    val s = GraftSession.get("local[32]")
    import s.implicits._

    // capture the FINAL adaptive plan of each noop write (the df's own
    // queryExecution is a fresh unexecuted plan - the write command's
    // QueryExecution holds the finalized AdaptiveSparkPlanExec)
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    s.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastPlan.set(qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    val hotKey = 1L
    val part = sources.Tables.part(s, dir)
      .select($"p_partkey", $"p_brand")

    // no broadcast anywhere: the probe is about the SHUFFLED join
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    // two tiers: 10% of rows on the hot key (under AQE's 256 MB
    // skewedPartitionThreshold at sf10 - the splitter stands down) and
    // 33% (over it - the splitter acts)
    for (mod <- Seq(10, 3)) {
    val skewed = sources.Tables.lineitem(s, dir)
      .withColumn("pk",
        when($"l_orderkey" % mod === 0, lit(hotKey)).otherwise($"l_partkey"))
      .select($"pk", $"l_orderkey", $"l_extendedprice")

    // skew evidence: the hot key's share of the fact side
    val tot = skewed.count()
    val hot = skewed.filter($"pk" === hotKey).count()
    println(f"[q40aqe] mod=$mod rows=$tot hotKey rows=$hot (${hot * 100.0 / tot}%.1f%%)")

    def plain = skewed.join(part, $"pk" === $"p_partkey")
      .select($"pk", $"p_brand", $"l_extendedprice")
    def salted = operators.Skew
      .saltedJoin(skewed, part.withColumnRenamed("p_partkey", "pk"),
        "pk", "l_orderkey", 32)
      .select($"pk", $"p_brand", $"l_extendedprice")

    // warm scan + codegen
    plain.agg(count(lit(1))).collect()

    def bench(tag: String, aqe: Boolean, df: => DataFrame): Double = {
      s.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q40aqe] $tag: $t%.2f s (min of 3)")
      t
    }

    val n1 = plain.count()
    // did the splitter actually act? run once and inspect the FINAL
    // adaptive plan for skewed AQEShuffleRead partitions
    s.conf.set("spark.sql.adaptive.enabled", "true")
    plain.write.format("noop").mode("overwrite").save()
    s.streams // no-op; ensure listener fired
    Thread.sleep(500)
    val finalPlan = lastPlan.get
    println(s"[q40aqe] mod=$mod final plan has skewed read: " +
      (finalPlan.contains("skewed") || finalPlan.contains("skew=true")))
    finalPlan.linesIterator
      .filter(l => l.contains("Join") || l.contains("AQEShuffleRead"))
      .foreach(l => println(s"[q40aqe]   plan| ${l.trim.take(110)}"))
    bench("plain-aqe-on   (skewJoin splitter)", aqe = true, plain)
    bench("plain-aqe-off  (unmitigated)", aqe = false, plain)
    // AQE's skew detector reads COMPRESSED shuffle bytes: a 20M-row
    // straggler of three longs compresses under the 256 MB default
    // threshold and never splits. Tune the thresholds to what the rows
    // actually weigh and re-measure.
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "32m")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    plain.write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    println(s"[q40aqe] mod=$mod tuned plan has skewed read: " +
      lastPlan.get.contains("skewed"))
    bench("plain-aqe-tuned (32m skew threshold)", aqe = true, plain)
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "256m")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    val n3 = salted.count()
    require(n1 == n3, s"salted join changed the result: $n1 vs $n3")
    bench("salted-32-aqe-on (Skew.saltedJoin)", aqe = true, salted)
    bench("salted-32-aqe-off", aqe = false, salted)
    }

    s.stop()
  }
}
