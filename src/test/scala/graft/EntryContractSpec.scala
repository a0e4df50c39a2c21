package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the gate's query/oracle maps must stay in
  * lockstep (a query without an oracle silently downgrades to a weaker
  * rows-only check in the harness — since the round-10 deterministic
  * sketch upgrades, NO query is allowed to), and the flagship entry
  * must produce rows.
  */
class EntryContractSpec extends AnyFunSuite {
  test("every oracle key names a query and every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty,
      s"queries without oracles: ${(q -- o).toSeq.sorted}")
  }

  test("the flagship entry query returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
