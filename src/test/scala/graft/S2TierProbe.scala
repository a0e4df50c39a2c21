package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 s2 tier experiments (verdict item 6): recall/candidate
  * trade at sf10 (500k vectors) for parameterized variants of the
  * query-directed multi-probe — plane count, weak-bit width, radius,
  * and a QUALITY-RANKED top-T probe budget (masks ordered by the summed
  * |dot| margin of their flipped planes — Lv et al.'s probing-sequence
  * idea — instead of exhausting every subset of size <= r). Ground
  * truth is s1. Reports recall, candidate rows, and wall seconds per
  * config so the production tier rule can be chosen on evidence.
  *
  * RECORDED at sf10 (200k vectors, truth pairs 50, T = mask budget/table):
  *   p=16 wb=16 r=6 T=6885  recall 1.00  cands 39%/query  (the tier)
  *   p=16 wb=14 r=5 all     recall 0.92  (full enumeration, same budget)
  *   p=16 wb=16 r=6 T=3473  recall 0.86; T=1732 0.78
  *   p=18 wb=16 r=6 T=6885  recall 0.76  cands 13.2%
  *   p=18 wb=18 r=6 T=6885  recall 0.76  cands 13.3%
  *   p=18 wb=18 r=8 T=6885  recall 0.84  cands 13.2%
  *   p=18 wb=18 r=8 T=13770 recall 0.94  cands 22.9%
  *   p=20 wb=16 r=6 T=6885  recall 0.58  cands 4.1%
  *   p=20 wb=20 r=6 T=6885  recall 0.62  cands 4.2%
  * Conclusion: finer buckets spread true neighbors across more bits than
  * any bounded flip budget reaches — the ~4-occupant plane rule with the
  * ranked 6,885-mask budget is the recall knee; sub-5% candidate scans at
  * >=0.9 recall belong to s3/s8, not this family.
  */
object S2TierProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import operators.Similarity
    import Similarity.{Dim, NumQueries, NumTables, TopK}

    val truth = Similarity.s1(s, dir).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"truth pairs: ${truth.size}")

    val e0 = Tables0.embeddings(s, dir)
    val n = e0.count()
    println(s"vectors: $n  default planes: ${Similarity.numPlanes(n)}")

    def planeTable(t: Int, planes: Int): Array[Array[Double]] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes) { p =>
        Array.tabulate(Dim) { i =>
          val seed = if (t == 0) s"$p|$i" else s"t$t|$p|$i"
          val hex = md.digest(seed.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          Integer.parseInt(hex.substring(0, 1), 16) - 7.5
        }
      }
    }
    def dotCol(emb: Column, wgt: Array[Double]): Column = {
      val lits = array(wgt.map(lit): _*)
      aggregate(zip_with(emb, lits, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
    }
    def bucketCol(emb: Column, table: Int, planes: Int): Column =
      planeTable(table, planes).zipWithIndex.map { case (w, p) =>
        when(dotCol(emb, w) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)

    /** Candidate set for (planes p, weak width wb, radius r, budget T):
      * all subsets of the wb weakest bits with size <= r, ranked by
      * (sum of flipped |dot|, mask), top T per table kept.
      */
    def scored(p: Int, wb: Int, r: Int, budget: Int): DataFrame = {
      val e = e0.select(($"vec_id" +: $"embedding" +:
        (0 until NumTables).map(t =>
          bucketCol($"embedding", t, p).as(s"b$t"))): _*)
        .localCheckpoint(true)
      val subsets = typedLit(
        (0 to r).flatMap(k => (0 until wb).combinations(k).map(_.toSeq)))
      val pow2 = typedLit((0 until p).map(1 << _))
      (0 until NumTables).map { t =>
        val dots = array(planeTable(t, p).map(w => dotCol($"q_emb", w)): _*)
        val weak = slice(array_sort(transform(sequence(lit(0), lit(p - 1)),
          i => struct(abs(element_at(dots, i + 1)).as("a"), i.as("i")))),
          1, wb)
        val q0 = e.filter($"vec_id" < NumQueries)
          .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
            col(s"b$t").as("qb"))
          .select($"query_id", $"q_emb", $"qb", weak.as("wk"))
        // per-subset (quality, xor-mask): quality sums the flipped
        // planes' |dot| in subset-position order; rank by (quality, mask)
        val qm = transform(subsets, sub => struct(
          aggregate(sub, lit(0.0), (acc, pos) =>
            acc + element_at($"wk", pos + lit(1)).getField("a")).as("qual"),
          aggregate(sub, lit(0), (acc, pos) => acc +
            element_at(pow2,
              element_at($"wk", pos + lit(1)).getField("i") + lit(1)))
            .as("mask")))
        val topT = slice(array_sort(qm), 1, budget)
        val q = q0
          .select($"query_id", $"q_emb",
            explode(transform(topT, x => $"qb".bitwiseXOR(x.getField("mask"))))
              .as("probe"))
        val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"),
          col(s"b$t").as("n_bucket"))
        c.join(broadcast(q),
            $"probe" === $"n_bucket" && $"query_id" =!= $"neighbor_id")
          .withColumn("cos",
            round(graft.functions.Vec.cosineFast($"q_emb", $"n_emb"), 6))
          .select($"query_id", $"neighbor_id", $"cos")
      }.reduce(_ union _).distinct()
    }

    def run(tag: String, p: Int, wb: Int, r: Int, budget: Int): Unit = {
      val t0 = System.nanoTime()
      val cand = scored(p, wb, r, budget).localCheckpoint(true)
      val nc = cand.count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
      val got = cand.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= TopK)
        .select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val rec = (truth & got).size.toDouble / truth.size
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CONFIG $tag p=$p wb=$wb r=$r T=$budget recall=$rec%.3f cands=$nc (${nc / NumQueries.toDouble / n * 100}%.2f%% of corpus/query) ${sec}%.1f s")
    }

    for (a <- args.drop(1)) {
      val Array(p, wb, r, t) = a.split(",").map(_.trim.toInt)
      run(a, p, wb, r, t)
    }
    s.stop()
  }

  /** Local alias so the probe compiles without importing sources.* */
  object Tables0 {
    def embeddings(s: SparkSession, dir: String): DataFrame =
      graft.sources.Tables.embeddings(s, dir)
  }
}
