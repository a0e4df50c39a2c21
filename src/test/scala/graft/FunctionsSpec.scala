package graft

import graft.functions.Vec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("native CosineSimilarity is bitwise-equal to the portable fold") {
    import s.implicits._
    val e = Tables.embeddings(s, d).limit(50)
    val a = e.toDF("a_id", "a_emb", "a_l")
    val b = e.toDF("b_id", "b_emb", "b_l")
    val both = a.join(b, $"a_id" < $"b_id")
      .select(Vec.cosine($"a_emb", $"b_emb").as("slow"),
        Vec.cosineFast($"a_emb", $"b_emb").as("fast"))
    assert(both.filter($"slow" =!= $"fast").count() == 0)
  }

  test("graft_cosine is registered for SQL via GraftExtensions") {
    Tables.embeddings(s, d).limit(10).createOrReplaceTempView("emb_fs")
    val n = s.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c
         FROM emb_fs a JOIN emb_fs b ON a.vec_id < b.vec_id""").count()
    assert(n == 45)
  }
}
