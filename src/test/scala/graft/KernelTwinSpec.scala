package graft

import graft.functions.{ShingleSketches, SimHash, SimHashAgg, Text}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole-document sketch kernels must be bit-identical to their
  * aggregate "portable twin" formulations (the forms the DuckDB oracles
  * mirror) — three independent implementations of each sketch, one
  * assertion. A divergence here means the oracle no longer proves what
  * the production path computes.
  */
class KernelTwinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("SimHash kernel == SimHashAgg aggregate on the corpus") {
    import s.implicits._
    val viaKernel = operators.Dedup.simhashes(s, d)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    val viaAgg = Tables.documents(s, d)
      .withColumn("toks", Text.tokens($"text"))
      .select($"doc_id",
        explode(array_distinct(Text.shingles($"toks"))).as("sh"))
      .withColumn("m", md5($"sh"))
      .groupBy($"doc_id")
      .agg(SimHashAgg($"m").as("h"))
      .select(($"doc_id" +: (1 to SimHash.Halves).map(i =>
        element_at($"h", i))): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(viaKernel.nonEmpty && viaKernel == viaAgg,
      s"kernel=${viaKernel.size} agg=${viaAgg.size} docs; signatures diverge")
  }

  test("MinHash kernel == minhashSig expression aggregates on the corpus") {
    import s.implicits._
    val viaKernel = Tables.documents(s, d)
      .withColumn("toks", Text.tokens($"text"))
      .select($"doc_id", explode(ShingleSketches.minhash($"toks")).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (u1, u2) = Text.minhashWords($"sh")
    val sigAggs = (0 until 9)
      .map(i => Text.minhashSig($"u1", $"u2", i).as(s"sig$i"))
    val viaAggs = Tables.documents(s, d)
      .withColumn("toks", Text.tokens($"text"))
      .select($"doc_id", explode(Text.shingles($"toks")).as("sh"))
      .withColumn("u1", u1).withColumn("u2", u2)
      .groupBy($"doc_id").agg(sigAggs.head, sigAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 9).map(r.getLong).toSeq).toMap
    assert(viaKernel.nonEmpty && viaKernel == viaAggs,
      s"kernel=${viaKernel.size} agg=${viaAggs.size} docs; signatures diverge")
  }
}
