package graft.operators

import graft.functions.{Vec, VecSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY §2 E).
  *
  * s1 is the exact baseline (bounded query set × corpus — a broadcast of
  * the queries, so the corpus side streams); s2 (random-hyperplane LSH) and
  * s3 (IVF with Lloyd refinement) are the scale paths that bound the
  * candidate set per query; their recall is spec-tested against s1.
  */
object Similarity {
  private type Q = (SparkSession, String) => DataFrame
  val Dim = 64
  val TopK = 10
  val NumQueries = 5 // query set = vec_id < 5
  val NumPlanes = 6 // 64 buckets; multi-probe widens recall
  val NumCentroids = 16
  val NProbe = 4

  private def topkPerQuery(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
  }

  /** s1: brute-force cosine top-k for the fixed query set. */
  def s1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < NumQueries).select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .withColumn("cos", round(Vec.cosineFast($"q_emb", $"n_emb"), 6))
      .select($"query_id", $"neighbor_id", $"cos")
    topkPerQuery(scored)
  }

  val s1Sql: String = s"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        round(${VecSql.cosine("q.embedding", "c.embedding", 64)}, 6) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id < $NumQueries
        AND q.vec_id <> c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= $TopK"""

  val NumTables = 2 // independent LSH tables; candidates are unioned

  /** Deterministic pseudo-random hyperplane weights from md5 nibbles, one
    * plane set per hash table (table 0 keeps the original seeds — Dedup.d5
    * and its DuckDB oracle mirror depend on them).
    */
  private[operators] def planeTable(t: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumPlanes) { p =>
      Array.tabulate(Dim) { i =>
        val seed = if (t == 0) s"$p|$i" else s"t$t|$p|$i"
        val hex = md.digest(seed.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        Integer.parseInt(hex.substring(0, 1), 16) - 7.5
      }
    }
  }

  private[operators] def planeWeights: Array[Array[Double]] = planeTable(0)

  /** Sign-bit bucket id for one embedding column (table 0 is shared with
    * Dedup.d5's candidate gating).
    */
  private[operators] def bucketCol(emb: Column, table: Int = 0): Column =
    planeTable(table).zipWithIndex.map { case (w, p) =>
      val lits = array(w.map(lit): _*)
      val dot = aggregate(zip_with(emb, lits, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** s2: random-hyperplane LSH ANN — [[NumTables]] independent hash
    * tables, multi-probe (Hamming ≤ 2, 22 of 64 buckets) per table,
    * candidates unioned, then exact cosine top-k within them. Rows-only
    * (recall spec). The (table, bucket) id is the shuffle/join key, so
    * candidate work per query is bounded by probe-set bucket occupancy,
    * not corpus size; at larger corpora, add planes to keep occupancy
    * flat.
    */
  def s2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probeMasks = (0 until (1 << NumPlanes))
      .filter(m => Integer.bitCount(m) <= 2).map(lit)
    val scored = (0 until NumTables).map { t =>
      val e = Tables.embeddings(s, dir)
        .withColumn("bucket", bucketCol($"embedding", t))
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
          explode(array(probeMasks.map($"bucket".bitwiseXOR(_)): _*)).as("probe"))
      val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"),
        $"bucket".as("n_bucket"))
      c.join(broadcast(q),
          $"probe" === $"n_bucket" && $"query_id" =!= $"neighbor_id")
        .withColumn("cos", round(Vec.cosineFast($"q_emb", $"n_emb"), 6))
        .select($"query_id", $"neighbor_id", $"cos")
    }.reduce(_ union _).distinct() // same pair in several tables: one row
    topkPerQuery(scored)
  }

  /** s3: IVF — deterministic seed centroids (lowest vec_ids), Lloyd
    * refinement, nprobe-cell search. Rows-only (recall spec).
    */
  def s3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    // seed: the NumCentroids lowest vec_ids (deterministic, cheap)
    var centroids: Array[Array[Double]] = e.filter($"vec_id" < NumCentroids)
      .orderBy($"vec_id").collect()
      .map(_.getSeq[Double](1).toArray)

    def assignExpr(cents: Array[Array[Double]]): Column = {
      // argmin of squared distance via fold over centroid literals
      val dists = cents.zipWithIndex.map { case (c, i) =>
        val lits = array(c.map(lit): _*)
        val d2 = aggregate(zip_with($"emb", lits, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
        struct(d2.as("d"), lit(i).as("i"))
      }
      array_min(array(dists: _*)).getField("i")
    }

    // Lloyd iterations: assignment + mean per cell/dim
    for (_ <- 0 until 2) {
      val assigned = e.withColumn("cid", assignExpr(centroids))
      val means = assigned
        .select($"cid", posexplode($"emb").as(Seq("dim", "x")))
        .groupBy($"cid", $"dim").agg(avg($"x").as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("cid"))(r.getAs[Int]("dim")) = r.getAs[Double]("m")
      }
      centroids = next
    }

    val assigned = e.withColumn("cid", assignExpr(centroids))
    // nprobe cells per query, computed on the driver over the tiny codebook
    val queries = assigned.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"emb".as("q_emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s0 += d * d; i += 1 }
      s0
    }
    val probeRows = queries.flatMap { case (qid, qe) =>
      centroids.zipWithIndex.sortBy { case (c, i) => (d2(qe, c), i) }
        .take(NProbe).map { case (_, cid) => (qid, cid, qe) }
    }
    val probes = s.createDataFrame(probeRows.toSeq)
      .toDF("query_id", "p_cid", "q_emb")
    val scored = assigned
      .join(broadcast(probes), $"cid" === $"p_cid" && $"query_id" =!= $"vec_id")
      .withColumn("cos", round(Vec.cosineFast($"q_emb", $"emb"), 6))
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cos")
    topkPerQuery(scored)
  }

  val queries: Map[String, Q] = Map(
    "s1_bruteforce_topk" -> s1, "s2_lsh_ann" -> s2, "s3_ivf_ann" -> s3)

  // s2/s3 are approximate — rows-only in the gate, recall-tested in specs
  val oracles: Map[String, String] = Map("s1_bruteforce_topk" -> s1Sql)
}
