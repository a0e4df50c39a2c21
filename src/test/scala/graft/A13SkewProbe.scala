package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skewed-changelog probe for a13/a14 at 100× scale (round-11 verdict
  * item 6): Kafka-style log compaction exists precisely for skewed write
  * streams, but the gate workload's bucket keys are uniform — this probe
  * redirects 10% of a 10M-row changelog onto ONE hot key and checks that
  * the a13/a14 plan shapes stay balanced and correct.
  *
  * Why they should: a13's window partitions on (segment, key) — the hot
  * key's 1M writes split across ~720 hourly segments (~1.4k rows per
  * window group, the sequential floor ONE task pays), so no task inherits
  * the key's full mass even before AQE's skew splitter sees the exchange.
  * a14's (snap, key) reconstruction is a hash AGGREGATE, so the hot key
  * is map-side combined to one partial per task before the shuffle —
  * skew never reaches the exchange at all.
  *
  * Recorded run (sf10 host, 2026-08-15, HEAD eb9dea5 — see
  * docs/AB_sf10_r12.md for the same-host discipline):
  *   a13 uniform 1.43 s / skewed 1.18 s (min of 3 — skew is FREE here);
  *   26,620 (seg,key) groups, max 2,600 rows vs 376 avg; window ≡
  *   aggregate form (0 diff rows). a14 skewed 2.00 s with the hot
  *   (snap,key) group at 750,600 rows absorbed by partial aggregation.
  *
  * Usage: Test/runMain graft.A13SkewProbe [sfDir]
  */
object A13SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf10data")
    val s = GraftSession.get("local[32]")
    import s.implicits._

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[a13skew] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def logOf(hot: Boolean) = {
      val key =
        if (hot) when($"user_id" % 10 === 0, lit("hot"))
          .otherwise(concat(lit("k"), ($"user_id" % 40).cast("string")))
        else concat(lit("k"), ($"user_id" % 40).cast("string"))
      sources.Tables.events(s, dir)
        .select(date_trunc("hour", $"ts").as("seg"), key.as("key"),
          floor($"value" * 100).cast("long").as("v"), $"ts", $"event_id")
        .withColumn("value",
          when($"v" % 5 === 0, lit(null).cast("string"))
            .otherwise($"v".cast("string")))
    }

    // a13 shape: last write per (segment, key), tombstones retained
    val w = Window.partitionBy($"seg", $"key")
      .orderBy($"ts".desc, $"event_id".desc)
    def a13Of(hot: Boolean) = logOf(hot)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"seg".as("seg_start"), $"key", $"value",
        $"event_id".as("last_event_id"))

    // warm the scan
    logOf(hot = false).agg(count(lit(1))).collect()

    for (label <- Seq("uniform", "skewed"); hot = label == "skewed") {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        a13Of(hot).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[a13skew] a13-$label: $t%.2f s (min of 3)")
    }

    // the balance evidence: per-(seg,key) group sizes under skew — the
    // hot key must be segment-split, never one window group
    val g = logOf(hot = true).groupBy($"seg", $"key").count()
      .agg(max($"count").as("mx"), avg($"count").as("av"),
        count(lit(1)).as("groups")).head()
    println(s"[a13skew] skewed (seg,key) groups=${g.getLong(2)} " +
      s"max=${g.getLong(0)} avg=${g.getDouble(1)}")
    require(g.getLong(0) < 100000,
      "hot key must be split across segments, not one window group")

    // correctness under skew: the window path equals the order-free
    // aggregate form (last = max by (ts, event_id))
    val viaAgg = logOf(hot = true)
      .groupBy($"seg", $"key")
      .agg(max(struct($"ts", $"event_id", $"value")).as("last"))
      .select($"seg".as("seg_start"), $"key",
        $"last.value".as("value"), $"last.event_id".as("last_event_id"))
    val diff = a13Of(hot = true).exceptAll(viaAgg).count() +
      viaAgg.exceptAll(a13Of(hot = true)).count()
    println(s"[a13skew] a13 window-vs-agg diff rows: $diff")
    require(diff == 0, "skewed compaction must match the aggregate form")

    // a14 shape under the same skew: 3 snapshot boundaries, hash agg on
    // (snap, key) — partial aggregation absorbs the hot key map-side
    val log14 = logOf(hot = true)
      .select($"event_id".as("txn_id"), $"key", $"value")
    val r = log14.agg(min($"txn_id"), max($"txn_id")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val snaps = Seq(1L, 2L, 3L).map(i => (i, lo + (hi - lo) * i / 4))
      .toDF("snap_id", "boundary")
    val a14Skewed = log14.join(broadcast(snaps), $"txn_id" <= $"boundary")
      .groupBy($"snap_id", $"key")
      .agg(max(struct($"txn_id", $"value")).as("last"))
      .select($"snap_id", $"key", $"last.value".as("value"),
        $"last.txn_id".as("last_txn_id"))
    val t14 = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      a14Skewed.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    val mx14 = log14.join(broadcast(snaps), $"txn_id" <= $"boundary")
      .groupBy($"snap_id", $"key").count().agg(max($"count")).head().getLong(0)
    println(f"[a13skew] a14-skewed: $t14%.2f s (min of 3), max (snap,key) group $mx14")

    s.stop()
  }
}
