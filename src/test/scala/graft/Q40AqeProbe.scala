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

    val hotKey = 1L
    val skewed = sources.Tables.lineitem(s, dir)
      .withColumn("pk",
        when($"l_orderkey" % 10 === 0, lit(hotKey)).otherwise($"l_partkey"))
      .select($"pk", $"l_orderkey", $"l_extendedprice")
    val part = sources.Tables.part(s, dir)
      .select($"p_partkey", $"p_brand")

    // no broadcast anywhere: the probe is about the SHUFFLED join
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    // skew evidence: the hot key's share of the fact side
    val tot = skewed.count()
    val hot = skewed.filter($"pk" === hotKey).count()
    println(f"[q40aqe] rows=$tot hotKey rows=$hot (${hot * 100.0 / tot}%.1f%%)")

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
    bench("plain-aqe-on   (skewJoin splitter)", aqe = true, plain)
    bench("plain-aqe-off  (unmitigated)", aqe = false, plain)
    s.conf.set("spark.sql.adaptive.enabled", "true")
    val n3 = salted.count()
    require(n1 == n3, s"salted join changed the result: $n1 vs $n3")
    bench("salted-32-aqe-on (Skew.saltedJoin)", aqe = true, salted)
    bench("salted-32-aqe-off", aqe = false, salted)

    s.stop()
  }
}
