package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

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
