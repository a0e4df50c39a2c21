package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions: the s9 persisted IVF-PQ index and its g19
  * streaming serve twin (the s7↔g15 persist/serve discipline applied to
  * the s8 composite).
  */
class Round12Spec extends AnyFunSuite {
  private lazy val s = GraftSession.get("local[4]")
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Double, Long)] =
    df.select("query_id", "neighbor_id", "cos", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

  test("s9 persisted index reproduces the live s8 composite bit-for-bit") {
    assert(rows(operators.Similarity.s9(s, dir)) ===
      rows(operators.Similarity.s8(s, dir)))
  }

  test("g19 streamed serve equals the one-shot s8 run") {
    assert(rows(streaming.StreamOps.g19(s, dir)) ===
      rows(operators.Similarity.s8(s, dir)))
  }

  test("s9 reload is cold and complete: shapes re-derived from storage") {
    val (_, idxDir) = operators.Similarity.s9Persist(s, dir)
    val (coarse, codes, cents) = operators.Similarity.s9Reload(s, idxDir)
    operators.Similarity.rmTree(idxDir)
    // cell count k comes from the stored coarse rows, width from Dim
    assert(coarse.nonEmpty)
    assert(coarse.forall(_.length == operators.Similarity.Dim))
    assert(cents.length == operators.Similarity.NumSub)
    assert(cents.forall(m => m.length == operators.Similarity.SubK &&
      m.forall(_.length == operators.Similarity.SubDim)))
    assert(codes.columns.toSet === Set("vec_id", "cell", "m", "cid"))
    // the code table survives deletion of the on-disk copy (it was
    // materialized before rmTree) and covers the full corpus
    val n = sources.Tables.embeddings(s, dir).count()
    assert(codes.select("vec_id").distinct().count() === n)
  }
}
