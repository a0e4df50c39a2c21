package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The sf100 probe's carrying lesson, measured: q5's fact-fact
  * orders⋈lineitem SMJ is the shuffle that couples queries on one box
  * and the one to co-partition on a fleet. This probe runs the SAME q5
  * aggregate three ways at an SF dir and prints wall seconds + the
  * exchange count feeding the fact-fact join:
  *
  *   raw       — q5 as shipped: both fact sides shuffle on the order key
  *   bucketed  — orders/lineitem pre-bucketed on the join key (h5's
  *               mechanism, 32 buckets): the SMJ reads bucket-aligned
  *               files, NO exchange on either fact side
  *   bucket-amortize — the one-time bucketed-write cost, for honesty:
  *               bucketing pays for itself after write_cost/saving reps
  *
  * Usage: Test/runMain graft.Q5BucketProbe [sfDir] [reps]
  */
object Q5BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf10data"
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = GraftSession.get("local[32]")
    import s.implicits._

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best(name: String)(body: => Unit): Double = {
      val ts = (1 to reps).map(_ => time(body))
      println(f"$name%-18s min ${ts.min}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
      ts.min
    }
    def exchanges(df: DataFrame): Int = {
      df.count() // finalize the AQE tree
      val p = df.queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(p).size - "ReusedExchange".r.findAllIn(p).size
    }

    // the q5 tail after the fact-fact edge, shared by both variants
    def tail(facts: DataFrame): DataFrame = facts
      .join(graft.plans.Hints.maybeBroadcast(Tables.customer(s, dir)),
        $"o_custkey" === $"c_custkey")
      .join(graft.plans.Hints.maybeBroadcast(Tables.supplier(s, dir)),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .groupBy($"r_name", $"n_name")
      .agg(graft.Portable.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))

    val raw = tail(Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey"))
    println(s"raw exchanges: ${exchanges(raw)}")
    best("q5 raw")(raw.write.format("noop").mode("overwrite").save())

    val wh = s"/tmp/graft_q5bucket_${java.util.UUID.randomUUID().toString.take(8)}"
    val (to, tl) = ("q5p_orders", "q5p_lineitem")
    val wWrite = time {
      Tables.orders(s, dir).write.mode("overwrite")
        .option("path", s"$wh/o")
        .bucketBy(32, "o_orderkey").sortBy("o_orderkey").saveAsTable(to)
      Tables.lineitem(s, dir).write.mode("overwrite")
        .option("path", s"$wh/l")
        .bucketBy(32, "l_orderkey").sortBy("l_orderkey").saveAsTable(tl)
    }
    println(f"bucketed write (one-time): $wWrite%.2f s")

    try {
      val bucketed = tail(s.table(tl).hint("merge")
        .join(s.table(to), $"l_orderkey" === $"o_orderkey"))
      println(s"bucketed exchanges: ${exchanges(bucketed)}")
      val a = raw.orderBy($"r_name", $"n_name").collect().toSeq
      val b = bucketed.orderBy($"r_name", $"n_name").collect().toSeq
      require(a == b, "bucketed variant changed the answer")
      best("q5 bucketed")(bucketed.write.format("noop").mode("overwrite").save())
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $to")
      s.sql(s"DROP TABLE IF EXISTS $tl")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(wh))
    }
    s.stop()
  }
}
