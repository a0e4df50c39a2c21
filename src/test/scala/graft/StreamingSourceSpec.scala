package graft

import graft.operators.TxnQueries
import graft.sources.{Tables, TxnLog}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSourceSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("file-based streaming source picks up parquet increments") {
    import s.implicits._
    val dir = Files.createTempDirectory("graft_stream_src_").toString
    val ev = Tables.events(s, d).select($"event_id", $"event_type")
    val (b1, b2) = (ev.filter($"event_id" % 2 === 0), ev.filter($"event_id" % 2 =!= 0))
    b1.write.parquet(s"$dir/p1")

    val stream = s.readStream.schema(ev.schema).parquet(s"$dir/p*")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("src_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val afterB1 = s.table("src_counts").agg(sum($"n")).collect()(0).getLong(0)
      assert(afterB1 == b1.count())
      b2.write.parquet(s"$dir/p2")
      q.processAllAvailable()
      val afterB2 = s.table("src_counts").agg(sum($"n")).collect()(0).getLong(0)
      assert(afterB2 == ev.count(), "second file increment not picked up")
    } finally q.stop()
  }

  test("JSON txn-log codec round-trips the workload exactly") {
    val txns = TxnQueries.workload(s, d)
    val decoded = TxnLog.decode(TxnLog.encode(txns)).collect().sortBy(_.txnId)
    assert(decoded.sameElements(txns.collect().sortBy(_.txnId)))
  }

  test("multi-key JSON codec round-trips asserts/updates incl. deletes") {
    val txns = TxnQueries.multiKeyBlindWorkload(s, d)
    val decoded = TxnLog.decodeMk(TxnLog.encodeMk(txns)).collect().sortBy(_.txnId)
    val orig = txns.collect().sortBy(_.txnId)
    assert(decoded.sameElements(orig))
    // deletes (valueOption = None) must survive the JSON round trip
    assert(orig.exists(_.updates.exists(_.valueOption.isEmpty)),
      "workload should contain deletes")
  }

  test("g9 streaming top-k equals the batch top-k") {
    import s.implicits._
    val streamed = graft.streaming.StreamOps.g9(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = Tables.events(s, d)
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
      .orderBy($"n_events".desc, $"user_id").limit(10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.sorted.sameElements(batch.sorted))
    assert(streamed.length == 10)
  }

  test("g10 streaming ingest dedup equals batch d9") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = rows(graft.streaming.StreamOps.g10(s, d))
    val batch = rows(graft.operators.Dedup.d9(s, d))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("txn log written as json files replays through the engine") {
    import s.implicits._
    val dir = Files.createTempDirectory("graft_txnlog_").toString
    val txns = TxnQueries.workload(s, d)
    TxnLog.encode(txns).write.mode("overwrite").text(dir)
    val replayed = TxnLog.decode(s.read.text(dir).toDF("value"))
    val a = graft.streaming.TxnEngine
      .applyState(replayed, graft.streaming.TxnEngine.Conditional)
      .collect().map(r => r.key -> r.value).toMap
    val b = graft.streaming.TxnEngine
      .applyState(txns, graft.streaming.TxnEngine.Conditional)
      .collect().map(r => r.key -> r.value).toMap
    assert(a == b)
  }
}
