package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the gate's query/oracle maps must stay in
  * lockstep (a query without an oracle silently downgrades to a weaker
  * rows-only check in the harness — only the two declared sketches may
  * do that), and the flagship entry must produce rows.
  */
class EntryContractSpec extends AnyFunSuite {
  private val declaredRowsOnly =
    Set("q23_approx_distinct", "q27_approx_quantile")

  test("every oracle key names a query and every query has an oracle " +
      "unless declared rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o) == declaredRowsOnly,
      s"undeclared rows-only queries: ${((q -- o) -- declaredRowsOnly).toSeq.sorted}")
  }

  test("the flagship entry query returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
