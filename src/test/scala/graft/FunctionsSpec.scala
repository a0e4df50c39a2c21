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

  test("WindowPolyHash matches the declarative digest-word fold bit-for-bit") {
    import s.implicits._
    import graft.functions.{WindowPolyHash => W}
    val k = 3
    val docs = Seq(
      (1L, Seq("the", "quick", "brown", "fox", "jumps")),
      (2L, Seq("a", "b")),              // shorter than k -> empty
      (3L, Seq("x", "y", "z")),         // exactly k -> one window
      (4L, Seq.empty[String]))
      .toDF("id", "toks")
    val got = docs.select($"id", W($"toks", k).as("whs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // reference: the same chain via Spark's own md5/conv expressions
    val ths = docs.select($"id", transform(transform($"toks", t => md5(t)), m =>
      shiftleft((conv(substring(m, 1, 8), 16, 10).cast("long") * W.P11 +
        conv(substring(m, 9, 8), 16, 10).cast("long") * W.P12 + W.C1) % W.M1, 31) +
      (conv(substring(m, 1, 8), 16, 10).cast("long") * W.P21 +
        conv(substring(m, 9, 8), 16, 10).cast("long") * W.P22 + W.C2) % W.M2)
      .as("th"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def fold(th: Seq[Long]): Seq[Long] =
      if (th.length < k) Seq.empty
      else (0 to th.length - k).map { i =>
        th.slice(i, i + k).foldLeft(0L) { (acc, e) =>
          (((acc >>> 31) * W.B1 + (e >>> 31)) % W.M1 << 31) |
            ((acc & 2147483647L) * W.B2 + (e & 2147483647L)) % W.M2
        }
      }
    got.foreach { case (id, whs) => assert(whs == fold(ths(id)), s"doc $id") }
    assert(got(1L).length == 3 && got(2L).isEmpty &&
      got(3L).length == 1 && got(4L).isEmpty)
  }

  test("PunctCount equals the regex removed-char count, incl. non-ASCII") {
    import s.implicits._
    val rows = Seq("hello, world!", "", "   ", "a1B2 c3",
      "naïve café — ¡holá! ünïcødé", "tabs\tand\nnewlines",
      "emoji 😀 and 中文 chars", "1+1=2; x<y>z")
      .toDF("text")
    val got = rows.select(graft.functions.PunctCount($"text").as("p"),
      (length($"text") -
        length(regexp_replace($"text", "[^a-zA-Z0-9 ]", ""))).as("r"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("graft_cosine is registered for SQL via GraftExtensions") {
    Tables.embeddings(s, d).limit(10).createOrReplaceTempView("emb_fs")
    val n = s.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c
         FROM emb_fs a JOIN emb_fs b ON a.vec_id < b.vec_id""").count()
    assert(n == 45)
  }
}
