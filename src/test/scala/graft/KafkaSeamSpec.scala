package graft

import graft.streaming.KafkaTransport
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka seam can't be integration-tested here (no broker, no
  * connector jar) — this spec pins the failure MODE instead: the factory
  * is wired to Spark's source lookup and fails fast by name, rather than
  * compiling against the connector (which would break the build in this
  * sandbox) or silently returning an empty stream.
  */
class KafkaSeamSpec extends AnyFunSuite {
  test("kafka source factory fails fast by data-source name without the connector") {
    val e = intercept[Exception] {
      KafkaTransport.source(TestSpark.spark, "localhost:9092", "txns")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }
}
