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

  /** Txn ids that are the earliest remaining txn on *all* of their keys —
    * one generation of the Calvin scheduler, as a distributed computation
    * over (txn_id, key) metadata rows.
    */
  private def readyIds(remaining: DataFrame): DataFrame = {
    val earliest = remaining.groupBy(col("key"))
      .agg(min(col("txn_id")).as("mn"))
    remaining.join(earliest, "key")
      .groupBy(col("txn_id"))
      .agg(max(when(col("txn_id") === col("mn"), 0).otherwise(1)).as("blocked"))
      .filter(col("blocked") === 0)
      .select(col("txn_id"))
  }

  /** Assign conflict-free generations distributed: per round, every txn
    * that is the earliest remaining txn on all of its keys joins the
    * current generation (the Calvin sequencer/scheduler role). Input is
    * (txn_id, key) metadata rows; output is (txn_id, gen). O(conflict
    * chain depth) rounds of joins; the driver holds only the round
    * counter, never the txn set.
    */
  def generationsDF(txnKeys: DataFrame): DataFrame = {
    var remaining = txnKeys.localCheckpoint(true)
    var out = txnKeys.sparkSession.emptyDataFrame
      .select(lit(0L).as("txn_id"), lit(0).as("gen")).limit(0)
    var gen = 0
    while (!remaining.isEmpty) {
      val ready = readyIds(remaining).localCheckpoint(true)
      if (ready.isEmpty) throw new IllegalStateException("scheduler stalled")
      out = out.union(ready.select(col("txn_id"), lit(gen).as("gen")))
        .localCheckpoint(true)
      remaining = remaining.join(ready, Seq("txn_id"), "left_anti")
        .localCheckpoint(true)
      gen += 1
    }
    out
  }

  /** Spec/driver convenience over [[generationsDF]]. */
  def generations(spark: SparkSession, txns: Seq[Txn]): Seq[Seq[Txn]] = {
    import spark.implicits._
    val keys = txns.flatMap(t =>
      (t.asserts ++ t.updates).map(kv => (t.txnId, kv.key))).distinct
    val byGen = generationsDF(keys.toDF("txn_id", "key"))
      .as[(Long, Int)].collect().groupBy(_._2)
    val byId = txns.map(t => t.txnId -> t).toMap
    (0 until byGen.size).map(g => byGen(g).map(r => byId(r._1)).toSeq.sortBy(_.txnId))
  }

  /** Apply a multi-key txn log, fully distributed: per scheduler round,
    * the generation's asserts join the state (outer join on key), txns
    * gate on all-asserts-match, and successful updates merge back into
    * state. Scheduling metadata, per-txn results, and the KV state all
    * stay DataFrames keyed by txn_id/key; the driver holds only the round
    * counter and a per-round emptiness flag.
    *
    * Returns (final state (key, value), per-txn results (txnId,
    * succeeded)).
    */
  def applyMultiKey(txns: Dataset[Txn]): (DataFrame, DataFrame) = {
    val spark = txns.sparkSession
    import spark.implicits._
    applyMultiKeyFrom(Seq.empty[(Key, Value)].toDF("key", "value"), txns)
  }

  /** [[applyMultiKey]] starting from an existing state table — the unit of
    * work of one streaming micro-batch (see [[MultiKeyStream]]).
    */
  def applyMultiKeyFrom(initialState: DataFrame, txns: Dataset[Txn])
      : (DataFrame, DataFrame) = {
    val (st, res, _) = applyMultiKeyCounted(initialState, txns)
    (st, res)
  }

  /** One cogroup-fold emission: a state row (kind 0) or a txn result
    * (kind 1).
    */
  private final case class FoldEmit(kind: Int, txnId: Long, key: Key,
      value: Value, succeeded: Boolean)

  /** [[applyMultiKeyFrom]], also returning the number of scheduler phases
    * (the hot-key scalability metric the spec asserts on).
    *
    * Hot-key posture (the reference's per-key lock-waiter queues,
    * StreamyDb.scala:66-129, let a hot key's chain drain without blocking
    * other keys): single-key-only txns never occupy scheduler rounds.
    * Each phase (a) FOLDS every "ready" single-key txn — one distributed
    * `cogroup` over (state, txns) per key, applying a whole consecutive
    * run on that key in txnId order in one pass — and (b) applies the
    * ready multi-key generation via the join-gate-merge. A single-key txn
    * is ready when no earlier multi-key txn remains on its key; a
    * multi-key txn is ready when it is the earliest remaining MULTI-key
    * txn on each of its keys (earlier ready singles fold first within the
    * same phase, so its asserts read post-fold state). Phases therefore
    * count the multi-key conflict depth only: a 1,000-txn single-hot-key
    * log folds in ONE phase instead of 1,000 generation rounds.
    */
  def applyMultiKeyCounted(initialState: DataFrame, txns: Dataset[Txn])
      : (DataFrame, DataFrame, Int) = {
    val spark = txns.sparkSession
    import spark.implicits._
    val tds = txns.localCheckpoint(true)
    val flat = tds.toDF()
    val asserts = flat
      .select(col("txnId").as("txn_id"), explode(col("asserts")).as("a"))
      .select(col("txn_id"), col("a.key").as("key"),
        col("a.valueOption").as("expected"))
      .localCheckpoint(true)
    // last update wins within a txn (reference applies updates in order)
    val updates = flat
      .select(col("txnId").as("txn_id"), posexplode(col("updates")).as(Seq("pos", "u")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("txn_id"), col("u.key")).orderBy(col("pos").desc)))
      .filter(col("rn") === 1)
      .select(col("txn_id"), col("u.key").as("key"),
        col("u.valueOption").as("u_value"))
      .localCheckpoint(true)
    val txnKeys = flat.select(col("txnId").as("txn_id"),
      explode(array_distinct(concat(
        transform(col("asserts"), a => a.getField("key")),
        transform(col("updates"), u => u.getField("key"))))).as("key"))
    val arity = txnKeys.groupBy(col("txn_id"))
      .agg(count(lit(1)).as("nk"))
    var remaining = txnKeys
      .join(arity, "txn_id")
      .select(col("txn_id"), col("key"), (col("nk") > 1).as("is_multi"))
      .localCheckpoint(true)
    var state = initialState
    // keyless txns never enter the scheduler: vacuously successful
    var results = flat
      .filter(size(col("asserts")) + size(col("updates")) === 0)
      .select(col("txnId").as("txn_id"), lit(true).as("succeeded"))
      .localCheckpoint(true)
    var phases = 0
    while (!remaining.isEmpty) {
      // earliest remaining MULTI-key txn per key (null if none)
      val multiMin = remaining.filter(col("is_multi"))
        .groupBy(col("key")).agg(min(col("txn_id")).as("mmn"))
        .localCheckpoint(true)
      // (a) every single-key txn older than its key's earliest multi
      val readySingles = remaining.filter(!col("is_multi"))
        .join(multiMin, Seq("key"), "left_outer")
        .filter(col("mmn").isNull || col("txn_id") < col("mmn"))
        .select(col("txn_id"))
        .localCheckpoint(true)
      if (!readySingles.isEmpty) {
        val sk = tds.join(readySingles, tds("txnId") === col("txn_id"),
          "left_semi").as[Txn]
        val byKey = sk.groupByKey(t => (t.asserts ++ t.updates).head.key)
        val touched = byKey.keys.toDF("key").localCheckpoint(true)
        val stTouched = state.join(touched, Seq("key"), "left_semi")
          .as[(Key, Value)]
        val folded = stTouched.groupByKey(_._1).cogroup(byKey) {
          (k, stIt, txIt) =>
            var value: Option[Value] = stIt.buffered.headOption.map(_._2)
            val out = List.newBuilder[FoldEmit]
            txIt.toSeq.sortBy(_.txnId).foreach { t =>
              val ok = t.asserts.forall(_.valueOption == value)
              if (ok) t.updates.foreach(u => value = u.valueOption)
              out += FoldEmit(1, t.txnId, k, null, ok)
            }
            value.foreach(v => out += FoldEmit(0, -1L, k, v, false))
            out.result().iterator
        }.toDF().localCheckpoint(true)
        results = results.union(
            folded.filter(col("kind") === 1)
              .select(col("txnId").as("txn_id"), col("succeeded")))
          .localCheckpoint(true)
        state = state.join(touched, Seq("key"), "left_anti")
          .union(folded.filter(col("kind") === 0)
            .select(col("key"), col("value")))
      }
      // (b) the conflict-free multi-key generation, against post-fold state
      val ready = remaining.filter(col("is_multi")).join(multiMin, "key")
        .groupBy(col("txn_id"))
        .agg(max(when(col("txn_id") === col("mmn"), 0).otherwise(1)).as("blocked"))
        .filter(col("blocked") === 0)
        .select(col("txn_id"))
        .localCheckpoint(true)
      if (readySingles.isEmpty && ready.isEmpty)
        throw new IllegalStateException("scheduler stalled")
      if (!ready.isEmpty) {
        val failed = asserts.join(ready, "txn_id")
          .join(state, Seq("key"), "left_outer")
          .filter(!(col("expected") <=> col("value")))
          .select(col("txn_id")).distinct()
        results = results.union(
            ready.join(failed.withColumn("f", lit(1)), Seq("txn_id"), "left_outer")
              .select(col("txn_id"), col("f").isNull.as("succeeded")))
          .localCheckpoint(true)
        // generations are conflict-free, so ok-updates touch distinct keys
        val up = updates.join(ready, "txn_id")
          .join(failed, Seq("txn_id"), "left_anti")
          .select(col("key").as("u_key"), col("u_value"))
        state = state.join(up, col("key") === col("u_key"), "full_outer")
          .select(coalesce(col("key"), col("u_key")).as("key"),
            when(col("u_key").isNotNull, col("u_value"))
              .otherwise(col("value")).as("value"))
          .filter(col("value").isNotNull)
      }
      state = state.localCheckpoint(true)
      remaining = remaining
        .join(readySingles.union(ready.toDF()), Seq("txn_id"), "left_anti")
        .localCheckpoint(true)
      phases += 1
    }
    (state, results.select(col("txn_id").as("txnId"), col("succeeded")),
      phases)
  }

  /** Seq-input convenience (specs): collects only the per-txn results. */
  def applyMultiKey(spark: SparkSession, txns: Seq[Txn])
      : (DataFrame, Seq[MkResult]) = {
    import spark.implicits._
    val (state, results) = applyMultiKey(txns.toDS())
    (state, results.as[MkResult].collect().toSeq)
  }

  /** Streaming multi-key Calvin: the Structured-Streaming analog of the
    * reference's Kafka feedback loop (StreamyDb.scala:177-242 — results
    * re-entering as per-key apply/release messages). There the loop runs
    * between operators of one dataflow; here it runs between micro-batches:
    * each batch of txns goes through the fused scheduler/apply rounds
    * ([[applyMultiKeyFrom]]) against the distributed state carried from
    * all previous batches. Feeding batches in txnId order reproduces the
    * deterministic sequential semantics (proved by the spec oracle).
    *
    * Use as the `foreachBatch` sink of a `Dataset[Txn]` stream; the state
    * and accumulated per-txn results stay DataFrames throughout.
    */
  /** @param checkpointDir when set, every committed batch persists the KV
    *   state and that batch's results as parquet plus a commit marker —
    *   `dir/state/&lt;batchId&gt;`, `dir/results/&lt;batchId&gt;`,
    *   `dir/commits/&lt;batchId&gt;` (marker last, so a crash mid-write
    *   leaves an ignorable uncommitted directory). A new instance over the
    *   same dir restores from the highest committed batch, and
    *   `processBatch` skips batchIds at or below it — exactly the replayed
    *   micro-batch a restarted `foreachBatch` query re-delivers. Without
    *   it, state lives only in executor block storage (localCheckpoint)
    *   and dies with the session — the reference's Kafka-loop state is
    *   replayable by design (StreamyDb.scala:177-242); this is the Spark
    *   durable analog.
    */
  final class MultiKeyStream(spark: SparkSession,
      checkpointDir: Option[String] = None) {
    import spark.implicits._
    @volatile private var lastCommitted: Long = -1L
    @volatile private var stateDf: DataFrame =
      Seq.empty[(Key, Value)].toDF("key", "value")
    @volatile private var resultsDf: DataFrame =
      Seq.empty[(Long, Boolean)].toDF("txnId", "succeeded")

    private def hadoopFs(dir: String) = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

    // restore from the highest committed batch, if any
    checkpointDir.foreach { dir =>
      val fs = hadoopFs(dir)
      val commits = new org.apache.hadoop.fs.Path(s"$dir/commits")
      if (fs.exists(commits)) {
        val ids = fs.listStatus(commits).map(_.getPath.getName.toLong)
        if (ids.nonEmpty) {
          lastCommitted = ids.max
          stateDf = spark.read.parquet(s"$dir/state/$lastCommitted")
            .localCheckpoint(true)
          resultsDf = spark.read
            .parquet(ids.sorted.map(i => s"$dir/results/$i").toSeq: _*)
            .localCheckpoint(true)
        }
      }
    }

    def processBatch(batch: Dataset[Txn], batchId: Long): Unit = {
      if (batchId <= lastCommitted) return // replay after restart: done
      val (st, res) = applyMultiKeyFrom(stateDf, batch)
      checkpointDir match {
        case Some(dir) =>
          st.write.mode("overwrite").parquet(s"$dir/state/$batchId")
          res.write.mode("overwrite").parquet(s"$dir/results/$batchId")
          // re-root lineage at the durable copies
          stateDf = spark.read.parquet(s"$dir/state/$batchId")
          resultsDf = resultsDf
            .union(spark.read.parquet(s"$dir/results/$batchId"))
            .localCheckpoint(true)
          val fs = hadoopFs(dir)
          fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/commits"))
          fs.create(new org.apache.hadoop.fs.Path(s"$dir/commits/$batchId"),
            true).close()
          lastCommitted = batchId
        case None =>
          stateDf = st
          resultsDf = resultsDf.union(res).localCheckpoint(true)
      }
    }

    /** Current KV state (key, value). */
    def state: DataFrame = stateDf
    /** Per-txn outcomes accumulated across all batches. */
    def results: DataFrame = resultsDf
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
