package graft

import org.apache.spark.sql.functions._

/** Dev probe: verify a3/a4 dumps against a plain-JVM sequential replay of
  * the conditional workload — the engine-independent interpreter the specs
  * trust, usable at SFs where the DuckDB recursive-CTE oracle is
  * impractical (its working set is steps × events, ~100× sf0.1 at sf1).
  * Only the elementary (txn_id, key, v) projection is shared with the
  * engine under test; lag derivation, assert evaluation and the fold all
  * happen in JVM strings below.
  * Usage: runMain graft.TxnOracleProbe <sfDir> <dumpDir>
  */
object TxnOracleProbe {
  def main(args: Array[String]): Unit = {
    val (dir, dump) = (args(0), args(1))
    val s = GraftSession.get(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    import s.implicits._
    val rows = sources.Tables.events(s, dir)
      .select($"event_id".as("txn_id"),
        concat(lit("k"), ($"user_id" % 40).cast("string")).as("key"),
        floor($"value" * 100).cast("long").as("v"))
      .as[(Long, String, Long)].collect()

    // per key in txn order: new_val, static-lag assert_val, sequential fold
    val state = scala.collection.mutable.HashMap.empty[String, String]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Boolean)]
    rows.groupBy(_._2).foreach { case (key, ks) =>
      val ordered = ks.sortBy(_._1)
      val newVals = ordered.map { case (_, _, v) =>
        if (v % 5 == 0) null else v.toString }
      var cur: String = null
      ordered.zipWithIndex.foreach { case ((id, _, v), i) =>
        val lagN = if (v % 3 == 0) 2 else 1
        val assertVal = if (i - lagN >= 0) newVals(i - lagN) else null
        val ok = assertVal == cur
        if (ok) cur = newVals(i)
        results += ((id, key, ok))
      }
      // one row per key with the final cur (possibly null) — the
      // oracle's `rn = mx` projection
      if (ordered.nonEmpty) state(key) = cur
    }

    val a3got = s.read.parquet(s"$dump/a3_txn_conditional_state")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val a3exp = state.toMap
    val a3ok = a3got == a3exp
    println(s"TXNPROBE a3 match=$a3ok got=${a3got.size} exp=${a3exp.size}" +
      (if (!a3ok) s" firstDiff=${(a3exp.toSet -- a3got.toSet).take(3)}" else ""))

    val a4got = s.read.parquet(s"$dump/a4_txn_conditional_results")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(r => (r._1, r._2))
    val a4exp = results.sortBy(r => (r._1, r._2))
    val a4ok = a4got.sameElements(a4exp)
    println(s"TXNPROBE a4 match=$a4ok got=${a4got.length} exp=${a4exp.length}" +
      (if (!a4ok) s" firstDiff=${a4got.zip(a4exp).find(p => p._1 != p._2).take(1).toSeq}"
       else ""))

    // a5 streams the same conditional log — its final state must equal a3's
    val a5got = s.read.parquet(s"$dump/a5_stream_txn_kv")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val a5ok = a5got == a3exp
    println(s"TXNPROBE a5 match=$a5ok got=${a5got.size}")

    // a8/a9: the multi-key workload replayed by the spec-trusted
    // sequential interpreter (only the elementary txn projection is
    // shared with the engine)
    val mkExp = streaming.TxnEngine
      .sequentialOracle(operators.TxnQueries.multiKeyWorkload(s, dir))._1
    val mkOk = Seq("a8_txn_multikey", "a9_stream_txn_multikey").map { q =>
      val got = s.read.parquet(s"$dump/$q")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val ok = got == mkExp
      println(s"TXNPROBE ${q.take(2)} match=$ok got=${got.size} exp=${mkExp.size}")
      ok
    }
    s.stop()
    if (!(a3ok && a4ok && a5ok && mkOk.forall(identity))) sys.exit(1)
  }
}
