package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** a14 snapshot-read A/B at an SF dir: the round-13 PlanAudit find,
  * measured. OLD = `max(struct(txn_id, value))` per (snap, key) — the
  * string field's agg buffer is not UnsafeRow-mutable, so Spark demotes
  * to SortAggregateExec and SORTS all 3N snapshot-fanned rows (partial
  * sort-agg per partition, exchange, final sort-agg). NEW (shipped) =
  * hash-aggregable `max(txn_id)` with map-side combine + a broadcast
  * 1:1 join-back on the unique txn id (agg side ≤ |snaps|×Buckets rows
  * at any scale).
  *
  * Measured (min-of-3 same host, round 13): sf10 (10M events) old
  * 6.17 s vs shipped 1.02 s; sf100 (100M events) old 10.92 s vs shipped
  * 2.13 s — a steady 5-6× at both decades. The demotion's partial
  * sort-agg still combines map-side (the exchange stays small), so the
  * tax is the per-partition SORT of all 3N fanned rows: linear in data,
  * paid forever, invisible in a green gate — exactly why PlanAudit
  * flags the class instead of waiting for the wall clock.
  *
  * Usage: Test/runMain graft.A14AB [sfDir] [reps]
  */
object A14AB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf10data"
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = GraftSession.get("local[32]")
    import s.implicits._

    def best(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-14s min ${ts.min}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // a14's log/boundary construction, replicated for the OLD shape
    def old(): DataFrame = {
      val buckets = 40 // TxnQueries.Buckets
      val log = Tables.events(s, dir)
        .select($"event_id".as("txn_id"),
          concat(lit("k"), ($"user_id" % buckets).cast("string")).as("key"),
          floor($"value" * 100).cast("long").as("v"))
        .withColumn("value",
          when($"v" % 5 === 0, lit(null).cast("string"))
            .otherwise($"v".cast("string")))
      val r = log.agg(min($"txn_id"), max($"txn_id")).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val snaps = Seq(1L, 2L, 3L).map(i => (i, lo + (hi - lo) * i / 4))
        .toDF("snap_id", "boundary")
      log.join(broadcast(snaps), $"txn_id" <= $"boundary")
        .groupBy($"snap_id", $"key")
        .agg(max(struct($"txn_id", $"value")).as("last"))
        .select($"snap_id", $"key", $"last.value".as("value"),
          $"last.txn_id".as("last_txn_id"))
    }

    val a = old().orderBy($"snap_id", $"key").collect().toSeq
    val b = operators.TxnQueries.a14(s, dir)
      .select($"snap_id", $"key", $"value", $"last_txn_id")
      .orderBy($"snap_id", $"key").collect().toSeq
    require(a.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))) ==
      b.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))),
      "shapes disagree")

    best("a14 old")(old().write.format("noop").mode("overwrite").save())
    best("a14 shipped")(operators.TxnQueries.a14(s, dir)
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
