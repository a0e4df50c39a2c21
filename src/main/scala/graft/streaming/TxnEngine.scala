package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Deterministic transactional KV layer over Spark — the engine-level
  * re-expression of streamy-db's Calvin-on-a-stream design
  * (reference: /root/reference/modules/runners/flink/src/main/scala/domsj/
  * streamy/db/flink/StreamyDb.scala:66-175 and modules/core/.../
  * package.scala:24-58).
  *
  * Semantics (same as the reference): a transaction carries equality
  * *asserts* and *updates* over string keys/values; it succeeds iff every
  * assert matches the current stored value; on success its updates are
  * applied (`Some(v)` = put, `None` = delete). A deterministic total order
  * (txnId — the sequencer role) makes replay/parallel execution agree.
  *
  * Spark-first architecture, not a port:
  *  - single-key transactions: one shuffle on key, then an in-order fold
  *    per key — `groupByKey(...).flatMapGroups` in batch,
  *    `flatMapGroupsWithState` on a stream (state carries across
  *    micro-batches). No feedback topic needed because a single-key txn's
  *    reads and writes co-locate on its shuffle partition.
  *  - multi-key transactions: Calvin's scheduler is logically centralized;
  *    here the txn *metadata* (id → keys) is scheduled into conflict-free
  *    generations, and each generation's asserts/updates are evaluated
  *    distributed (join state on key → all-asserts gate → merge updates).
  *    Rounds = conflict chain depth, independent of data volume.
  */
object TxnEngine {

  type Key = String
  type Value = String

  /** Single-key transaction: one assert + one update on `key`.
    * `assertPresent=false` with null `assertValue` means "expect absent";
    * `hasAssert=false` means blind (no assert). `updateValue=null` deletes.
    */
  final case class SkTxn(txnId: Long, key: Key, hasAssert: Boolean,
      assertValue: Value, updateValue: Value)

  final case class TxnResult(txnId: Long, key: Key, succeeded: Boolean)
  final case class KvRow(key: Key, value: Value, lastTxnId: Long)

  /** Multi-key transaction (library form, spec-tested). */
  final case class KeyValueOption(key: Key, valueOption: Option[Value])
  final case class Txn(txnId: Long, asserts: Seq[KeyValueOption],
      updates: Seq[KeyValueOption])
  final case class MkResult(txnId: Long, succeeded: Boolean)

  /** Blind mode ignores assert outcomes when applying updates (asserts
    * become an audit flag); Conditional gates updates on asserts.
    */
  sealed trait Mode
  case object Blind extends Mode
  case object Conditional extends Mode

  private def fold(mode: Mode, txns: Iterator[SkTxn])
      : (Option[Value], Option[Long], List[TxnResult]) = {
    var state: Option[Value] = None
    var lastTxn: Option[Long] = None
    val results = List.newBuilder[TxnResult]
    txns.toSeq.sortBy(_.txnId).foreach { t =>
      val ok = !t.hasAssert || state == Option(t.assertValue)
      results += TxnResult(t.txnId, t.key, ok)
      if (ok || mode == Blind) {
        state = Option(t.updateValue)
        lastTxn = Some(t.txnId)
      }
    }
    (state, lastTxn, results.result())
  }

  /** Batch: apply a single-key txn log; returns per-txn results. */
  def applyResults(txns: Dataset[SkTxn], mode: Mode): Dataset[TxnResult] = {
    import txns.sparkSession.implicits._
    txns.groupByKey(_.key).flatMapGroups { (_, it) => fold(mode, it)._3 }
  }

  /** Batch: apply a single-key txn log; returns final KV state (deleted /
    * never-written keys appear with null value, for oracle parity).
    */
  def applyState(txns: Dataset[SkTxn], mode: Mode): Dataset[KvRow] = {
    import txns.sparkSession.implicits._
    txns.groupByKey(_.key).mapGroups { (k, it) =>
      val (state, lastTxn, _) = fold(mode, it)
      KvRow(k, state.orNull, lastTxn.getOrElse(-1L))
    }
  }

  /** Streaming: the KeyTransactionProcessor analog. State (current value)
    * lives in `GroupState` and carries across micro-batches; within a
    * micro-batch arrivals are folded in txnId order, so feeding batches in
    * txnId-range order reproduces the deterministic sequence.
    */
  def streamResults(txns: Dataset[SkTxn], mode: Mode): Dataset[StreamEmit] = {
    import txns.sparkSession.implicits._
    txns.groupByKey(_.key)
      .flatMapGroupsWithState[KState, StreamEmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, it, gs) =>
        var state: Option[Value] =
          gs.getOption.flatMap(s => Option(s.value))
        val out = List.newBuilder[StreamEmit]
        it.toSeq.sortBy(_.txnId).foreach { t =>
          val ok = !t.hasAssert || state == Option(t.assertValue)
          if (ok || mode == Blind) state = Option(t.updateValue)
          out += StreamEmit(t.txnId, key, ok, state.orNull)
        }
        gs.update(KState(state.orNull))
        out.result().iterator
      }
  }

  final case class KState(value: Value)
  /** Per-txn emission: outcome + the key's value after the txn. */
  final case class StreamEmit(txnId: Long, key: Key, succeeded: Boolean,
      valueAfter: Value)

  // ---------------------------------------------------------------------
  // Multi-key: generation scheduling + distributed application
  // ---------------------------------------------------------------------

  /** Assign conflict-free generations: repeatedly take every txn that is
    * the earliest remaining txn on *all* of its keys. Pure metadata
    * scheduling (the Calvin sequencer/scheduler role); O(chain depth)
    * rounds.
    */
  def generations(txns: Seq[Txn]): Seq[Seq[Txn]] = {
    val out = Seq.newBuilder[Seq[Txn]]
    var remaining = txns.sortBy(_.txnId)
    while (remaining.nonEmpty) {
      val earliest: Map[Key, Long] = remaining
        .flatMap(t => (t.asserts ++ t.updates).map(_.key -> t.txnId))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      val (ready, rest) = remaining.partition(t =>
        (t.asserts ++ t.updates).forall(kv => earliest(kv.key) == t.txnId))
      require(ready.nonEmpty, "scheduler stalled")
      out += ready
      remaining = rest
    }
    out.result()
  }

  /** Apply a multi-key txn log: per generation, join asserts against the
    * distributed state (outer join on key), gate on all-asserts-match per
    * txn, merge successful updates back into state. State stays a
    * DataFrame keyed by `key` throughout — the driver only ever holds txn
    * metadata, never data rows.
    */
  def applyMultiKey(spark: SparkSession, txns: Seq[Txn])
      : (DataFrame, Seq[MkResult]) = {
    import spark.implicits._
    var state = Seq.empty[(Key, Value)].toDF("key", "value")
    val results = Seq.newBuilder[MkResult]
    generations(txns).foreach { gen =>
      val asserts = gen.flatMap(t =>
        t.asserts.map(a => (t.txnId, a.key, a.valueOption.orNull)))
        .toDF("txn_id", "key", "expected")
      val ok: Set[Long] =
        if (asserts.isEmpty) gen.map(_.txnId).toSet
        else {
          val failed = asserts.join(state, Seq("key"), "left_outer")
            .filter(!(col("expected") <=> col("value")))
            .select("txn_id").distinct()
            .as[Long].collect().toSet
          gen.map(_.txnId).toSet -- failed
        }
      gen.foreach(t => results += MkResult(t.txnId, ok(t.txnId)))
      val updates = gen.filter(t => ok(t.txnId))
        .flatMap(t => t.updates.map(u => (u.key, u.valueOption.orNull)))
      if (updates.nonEmpty) {
        val up = updates.toDF("u_key", "u_value")
        state = state.join(up, col("key") === col("u_key"), "full_outer")
          .select(coalesce(col("key"), col("u_key")).as("key"),
            when(col("u_key").isNotNull, col("u_value"))
              .otherwise(col("value")).as("value"))
          .filter(col("value").isNotNull)
        // keep the lineage shallow across generations
        state = state.localCheckpoint(eager = true)
      }
    }
    (state, results.result())
  }

  /** Reference oracle for specs: strictly sequential interpreter. */
  def sequentialOracle(txns: Seq[Txn])
      : (Map[Key, Value], Seq[MkResult]) = {
    var state = Map.empty[Key, Value]
    val results = txns.sortBy(_.txnId).map { t =>
      val ok = t.asserts.forall(a => state.get(a.key) == a.valueOption)
      if (ok) t.updates.foreach { u =>
        u.valueOption match {
          case Some(v) => state += u.key -> v
          case None => state -= u.key
        }
      }
      MkResult(t.txnId, ok)
    }
    (state, results)
  }
}
