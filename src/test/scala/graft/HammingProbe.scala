package graft

import graft.functions.{SimHash, Text}
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dev probe: 128-bit SimHash Hamming distribution of true near-dup pairs
  * (the MinHash-LSH candidate set) vs the all-pairs background — used to
  * pick d4's default Hamming radius.
  */
object HammingProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("local[8]")
    import s.implicits._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val va = SimHash.voteAggs(col("m"))
      val votes = Tables.documents(s, d)
        .withColumn("toks", Text.tokens($"text"))
        .select($"doc_id", explode(array_distinct(Text.shingles($"toks"))).as("sh"))
        .withColumn("m", md5($"sh"))
        .groupBy($"doc_id")
        .agg(va.head, va.tail: _*)
      val halves = (0 until SimHash.Halves).map { h =>
        SimHash.half(b => col(s"v$b"), 32 * h, 32 * h + 32, 32 * h + 31).as(s"h$h")
      }
      val sig = votes.select(($"doc_id" +: halves): _*).localCheckpoint(true)
      val a = sig.toDF("a_id", "a0", "a1", "a2", "a3")
      val b = sig.toDF("b_id", "b0", "b1", "b2", "b3")
      val ham = (0 until 4).map(i => expr(s"bit_count(a$i ^ b$i)")).reduce(_ + _)
      val pairs = a.join(b, $"a_id" < $"b_id").withColumn("ham", ham.cast("int"))
        .localCheckpoint(true)
      val cands = Dedup.minhashCandidates(s, d).select($"a_id", $"b_id")
      val dup = pairs.join(cands, Seq("a_id", "b_id"), "left_semi")
      println(s"== $d dup-pair hamming histogram ==")
      dup.groupBy($"ham").count().orderBy($"ham")
        .collect().foreach(r => println(s"  ham=${r.getInt(0)} n=${r.getLong(1)}"))
      val q = pairs.stat.approxQuantile("ham",
        Array(0.0005, 0.001, 0.005, 0.01, 0.05, 0.5), 0.0001)
      println(s"  all-pairs ham quantiles(.0005,.001,.005,.01,.05,.5): ${q.mkString(", ")}")
      val n = sig.count()
      println(s"  docs=$n allPairs=${n * (n - 1) / 2} dupPairs=${dup.count()}")
    }
    s.stop()
  }
}
