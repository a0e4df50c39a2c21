package graft

import graft.streaming.KafkaTransport
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka seam can't be integration-tested here (no broker, and the
  * connector jar is unresolvable in the offline sandbox even as a test
  * dep) — this spec pins what CAN be pinned without it:
  *  - the failure MODE: the factory is wired to Spark's source lookup and
  *    fails fast by name, rather than compiling against the connector or
  *    silently returning an empty stream;
  *  - the option CONTRACT: every option the transport would hand the
  *    connector flows through one audited map builder whose exact keys
  *    and validation behavior are asserted here, so a drifted option
  *    string or an un-validated input is a test failure, not a runtime
  *    surprise at stream start on a real cluster.
  */
class KafkaSeamSpec extends AnyFunSuite {
  test("kafka source factory fails fast by data-source name without the connector") {
    val e = intercept[Exception] {
      KafkaTransport.source(TestSpark.spark, "localhost:9092", "txns")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("source options carry exactly the documented kafka-source keys") {
    val opts = KafkaTransport.sourceOptions(
      "broker1:9092,broker2:9092", "txn-input", "latest")
    assert(opts.keySet == KafkaTransport.SourceOptionKeys)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "txn-input")
    assert(opts("startingOffsets") == "latest")
  }

  test("sink options carry exactly the documented kafka-sink keys") {
    val opts = KafkaTransport.sinkOptions(
      "broker1:9092", "txn-results", "/chk/txn")
    assert(opts.keySet == KafkaTransport.SinkOptionKeys)
    assert(opts("topic") == "txn-results")
    assert(opts("checkpointLocation") == "/chk/txn")
  }

  test("malformed transport config fails in the factory, not the connector") {
    intercept[IllegalArgumentException] {
      KafkaTransport.sourceOptions("no-port-here", "txns")
    }
    intercept[IllegalArgumentException] {
      KafkaTransport.sourceOptions("b:9092", "bad topic!")
    }
    intercept[IllegalArgumentException] {
      KafkaTransport.sourceOptions("b:9092", "txns", "bogus-offsets")
    }
    intercept[IllegalArgumentException] {
      KafkaTransport.sinkOptions("b:9092", "txns", "")
    }
    // per-partition offset JSON is a documented valid form
    assert(KafkaTransport.sourceOptions("b:9092", "txns",
      """{"txns":{"0":23}}""")("startingOffsets").startsWith("{"))
  }
}
