package graft

import graft.sources.Tables
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift tripwire: the driver regenerates /root/testdata between
  * rounds and has already changed events.ts dtype once (nanos-as-long →
  * timestamp[us]). This suite loads all 10 tables through the production
  * loaders and fails loudly with the actual schema on any drift, so a
  * regeneration can't silently zero the correctness gate again.
  */
class SchemaSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("all tables load with the gate's required columns") {
    Tables.probe(s, d)
  }

  test("events.ts resolves to TimestampType for either testdata generation") {
    val ev = Tables.events(s, d)
    assert(ev.schema("ts").dataType == TimestampType, ev.schema.treeString)
    assert(ev.count() > 0)
  }

  test("timestamp columns used in oracles are timestamp-typed") {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    def isTs(dt: DataType): Boolean =
      dt == TimestampType || dt == TimestampNTZType
    assert(isTs(li.schema("l_shipdate").dataType), li.schema.treeString)
    assert(isTs(ord.schema("o_orderdate").dataType), ord.schema.treeString)
  }

  test("embeddings vectors are non-empty float arrays") {
    val em = Tables.embeddings(s, d)
    assert(em.schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      em.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      em.schema.treeString)
  }
}
