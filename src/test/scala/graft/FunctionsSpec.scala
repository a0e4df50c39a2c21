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

  test("ExactDecimalSum dsum/davg match the decimal-sum reference exactly") {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    // negatives, nulls, an all-null group, many partitions (forces merges)
    val rows = (1 to 5000).map { i =>
      val g = i % 7
      val v: java.lang.Double =
        if (g == 6) null
        else (i * 1234.5678 - 3000000.0) * (if (i % 3 == 0) -1 else 1)
      (g, v)
    }
    val df = s.createDataFrame(rows).toDF("g", "v").repartition(13)
    val got = df.groupBy($"g")
      .agg(Portable.dsum($"v").as("s"), Portable.davg($"v").as("a"))
    val ref = df.groupBy($"g")
      .agg(round(sum($"v".cast(DecimalType(30, 10))), 2).cast("double").as("s"),
        round(sum($"v".cast(DecimalType(30, 10))).cast("double") / count($"v"), 4)
          .cast("double").as("a"))
    assert(got.orderBy($"g").collect().toSeq ==
      ref.orderBy($"g").collect().toSeq)
  }

  test("graft_cosine is registered for SQL via GraftExtensions") {
    Tables.embeddings(s, d).limit(10).createOrReplaceTempView("emb_fs")
    val n = s.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c
         FROM emb_fs a JOIN emb_fs b ON a.vec_id < b.vec_id""").count()
    assert(n == 45)
  }
}
