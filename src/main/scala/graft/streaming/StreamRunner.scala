package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

/** Drives a Structured Streaming query synchronously from in-memory
  * batches (tests + the correctness gate run streams this way; production
  * points the same builders at readStream sources).
  */
object StreamRunner {
  private val n = new AtomicInteger(0)

  /** Feed `batches` through `build` and return the memory-sink table. */
  def run[T: Encoder](spark: SparkSession, batches: Seq[Seq[T]],
      outputMode: String = "append")(build: Dataset[T] => DataFrame): DataFrame = {
    implicit val sq = spark.sqlContext
    val name = s"graft_stream_${n.incrementAndGet()}"
    val ms = MemoryStream[T]
    val q = build(ms.toDS()).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  /** foreachBatch variant: feed `batches` through `f` (micro-batches are
    * processed synchronously and in order).
    */
  def runForeach[T: Encoder](spark: SparkSession, batches: Seq[Seq[T]])(
      f: (Dataset[T], Long) => Unit): Unit = {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[T]
    val q = ms.toDS().writeStream.foreachBatch(f).start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
  }

  /** Stage `batches` on disk for file-source replay: each batch is
    * written (distributed — the rows never land on the driver) as one
    * parquet file in its own sequenced directory, and the files'
    * modification times are spaced 60 s apart so the file source replays
    * directories in batch order. Returns the source glob + schema.
    *
    * The staging root must be visible to BOTH the driver (which touches
    * mtimes) and the executors (which write the parquet) — i.e. a shared
    * filesystem. That holds trivially in local mode (the gate/test path);
    * on a real cluster set `spark.graft.stagingDir` to a shared mount or
    * distributed-FS path, or feed the query from a durable source
    * directly (the a10/a12 pattern) instead of staging.
    */
  private def stageBatches(tag: String, batches: Seq[DataFrame])
      : (String, StructType) = {
    require(batches.nonEmpty, "need at least one batch")
    val root = stagingRoot(batches.head.sparkSession, tag)
    val base = (System.currentTimeMillis() / 1000) * 1000
    batches.zipWithIndex.foreach { case (b, i) =>
      val dir = s"$root/b$i"
      // one FILE per batch (maxFilesPerTrigger=1 replay ordering needs
      // it) but bounded ROW GROUPS inside it: parquet can't be split
      // within a row group, so the writer's default ~128 MB block left
      // each staged micro-batch readable at 1-2-way parallelism — the
      // per-batch op work (banding, gate scoring) ran on idle cores
      // (round 12; the Materialize.parallelized finding applied to the
      // ingest-sim path)
      b.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", 4L * 1024 * 1024)
        .parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .foreach { f =>
          // replay ORDER depends on these mtimes — a filesystem that
          // ignores setLastModified must fail loudly, not reorder state
          // updates silently
          require(f.setLastModified(base + i * 60000L),
            s"cannot sequence staged batch file $f via setLastModified")
        }
    }
    (s"$root/b*", batches.head.schema)
  }

  /** Staged-feed cache: key → (glob, schema) for feeds already written
    * this JVM. Staging a 1M-event feed costs more than the op it feeds
    * (round-12 op/sim split: g17 sim 26.3 s vs op 5.2), and the bench
    * replays every op min-of-K — so a deterministic feed keyed by
    * (sfDir, op batch-spec) is written ONCE and replayed K times. Keys
    * must uniquely determine batch CONTENT (callers embed the source dir
    * and their split spec); cached roots are deleted by
    * [[clearStagedCache]], not per-run.
    */
  private val stagedCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, StructType)]

  private def stageBatchesCached(tag: String, batches: => Seq[DataFrame],
      key: Option[String]): (String, StructType, Boolean) = key match {
    case None =>
      val (g, sc) = stageBatches(tag, batches)
      (g, sc, false)
    case Some(k) =>
      val (g, sc) = stagedCache.getOrElseUpdate(k, stageBatches(tag, batches))
      (g, sc, true)
  }

  /** Delete every cached staged feed (bench/gate end-of-run hygiene). */
  def clearStagedCache(): Unit = {
    stagedCache.values.foreach { case (glob, _) => removeStaged(glob) }
    stagedCache.clear()
  }

  /** Resolve a fresh directory for staged batches or batch-fed sinks:
    * under `spark.graft.stagingDir` when set (a shared mount /
    * distributed-FS path on a real cluster, so executors' writes are
    * visible to the driver's read-back), else the driver-local temp dir
    * (fine in local mode). Every stream feeder and foreachBatch sink that
    * needs a scratch directory resolves it HERE, so the shared-filesystem
    * constraint has exactly one knob.
    */
  private[graft] def stagingRoot(spark: SparkSession, tag: String): String =
    spark.conf.getOption("spark.graft.stagingDir") match {
      case Some(base) =>
        java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(base), s"graft_$tag").toString
      case None =>
        java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    }

  /** Best-effort recursive cleanup of a staged-batch root once its query
    * has drained (the replay files are inputs only; results live in the
    * sink), so repeated gate/bench runs don't accumulate table copies in
    * the temp dir.
    */
  private def removeStaged(glob: String): Unit = {
    val root = new java.io.File(glob.stripSuffix("/b*"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    if (root.getName.startsWith("graft_")) rm(root)
  }

  /** File-fed variant of [[run]]: batches are staged as parquet files and
    * replayed through a real `readStream` file source one file per
    * micro-batch — no batch data is ever materialized on the driver (the
    * production deployment points the same builder at a Kafka topic or
    * file drop; see sources/TxnLog.scala for the mapping).
    */
  def runFiles(spark: SparkSession, batches: => Seq[DataFrame],
      outputMode: String = "append", cacheKey: Option[String] = None)(
      build: DataFrame => DataFrame): DataFrame = {
    val (glob, schema, cached) =
      stageBatchesCached("gstream_", batches, cacheKey)
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(glob)
    val name = s"graft_stream_${n.incrementAndGet()}"
    val q = build(src).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    // the drain IS the operator for declarative streams (g11/g17/g18 —
    // state updates + sink); staging the feeder files above is ingest
    // SIMULATION. foreachBatch variants self-time their op bodies
    // instead, so this must not also wrap runForeachFiles.
    try StreamOps.MaintTimer.timed(q.processAllAvailable())
    finally { q.stop(); if (!cached) removeStaged(glob) }
    spark.table(name)
  }

  /** Two-source file-fed variant (stream-stream joins): each source
    * replays its own staged batch sequence, one file per trigger.
    */
  def run2Files(spark: SparkSession, aBatches: => Seq[DataFrame],
      bBatches: => Seq[DataFrame], outputMode: String = "append",
      cacheKey: Option[String] = None)(
      build: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val (aGlob, aSchema, aCached) =
      stageBatchesCached("gstreamA_", aBatches, cacheKey.map(_ + "#A"))
    val (bGlob, bSchema, bCached) =
      stageBatchesCached("gstreamB_", bBatches, cacheKey.map(_ + "#B"))
    def src(glob: String, schema: StructType) = spark.readStream
      .schema(schema).option("maxFilesPerTrigger", 1).parquet(glob)
    val name = s"graft_stream_${n.incrementAndGet()}"
    val q = build(src(aGlob, aSchema), src(bGlob, bSchema)).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally {
      q.stop()
      if (!aCached) removeStaged(aGlob)
      if (!bCached) removeStaged(bGlob)
    }
    spark.table(name)
  }

  /** foreachBatch file-fed variant: staged batches replay in order, one
    * per micro-batch, into `f` — the [[runForeach]] shape without the
    * driver ever holding a batch.
    */
  def runForeachFiles(spark: SparkSession, batches: => Seq[DataFrame],
      cacheKey: Option[String] = None)(
      f: (DataFrame, Long) => Unit): Unit = {
    val (glob, schema, cached) =
      stageBatchesCached("gforeach_", batches, cacheKey)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(glob)
      .writeStream.foreachBatch(f).start()
    try q.processAllAvailable()
    finally { q.stop(); if (!cached) removeStaged(glob) }
  }

  /** Two-source variant (stream-stream joins): batches are fed pairwise. */
  def run2[A: Encoder, B: Encoder](spark: SparkSession,
      aBatches: Seq[Seq[A]], bBatches: Seq[Seq[B]],
      outputMode: String = "append")(
      build: (Dataset[A], Dataset[B]) => DataFrame): DataFrame = {
    implicit val sq = spark.sqlContext
    val name = s"graft_stream_${n.incrementAndGet()}"
    val ma = MemoryStream[A]
    val mb = MemoryStream[B]
    val q = build(ma.toDS(), mb.toDS()).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try {
      aBatches.zipAll(bBatches, Seq.empty[A], Seq.empty[B]).foreach {
        case (a, b) =>
          if (a.nonEmpty) ma.addData(a)
          if (b.nonEmpty) mb.addData(b)
          q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
  }
}
