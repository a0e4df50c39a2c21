package graft

import graft.operators.TxnQueries
import graft.sources.TxnLog
import graft.streaming.TxnEngine
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production-streaming contract: the txn engine's per-key state must
  * survive a query stop/restart via the checkpoint (state store + source
  * offsets), exactly like the reference's checkpointed Flink job
  * (reference StreamyDb.scala:180 enableCheckpointing).
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("streaming txn engine recovers state from checkpoint across restarts") {
    import s.implicits._
    val root = Files.createTempDirectory("graft_ckpt_").toString
    val src = s"$root/src"; val cp = s"$root/cp"; val out = s"$root/out"
    new java.io.File(src).mkdirs()

    val txns = TxnQueries.workload(s, d).collect().sortBy(_.txnId).toSeq
    val mid = txns(txns.length / 2).txnId
    def writePart(part: Int, sel: TxnEngine.SkTxn => Boolean): Unit =
      TxnLog.encode(s.createDataset(txns.filter(sel)))
        .coalesce(1).write.mode("overwrite").text(s"$src/part$part")

    def startQuery() =
      TxnEngine.streamResults(
          TxnLog.decode(s.readStream.text(s"$src/part*").toDF("value")),
          TxnEngine.Conditional)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()

    writePart(1, _.txnId < mid)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    writePart(2, _.txnId >= mid)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = s.read.parquet(out).groupBy($"key")
      .agg(max_by($"valueAfter", $"txnId").as("value"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val batch = TxnEngine.applyState(s.createDataset(txns), TxnEngine.Conditional)
      .collect().map(r => r.key -> r.value).toMap
    assert(streamed == batch,
      "state after restart must equal the single-pass batch fold")
  }
}
