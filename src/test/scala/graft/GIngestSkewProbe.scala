package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skewed-ingest probe for the streaming maintenance twins (round-12
  * verdict item 6) — the streaming mirror of A13SkewProbe: g10/g12's
  * scaladocs claim per-batch cost stays |candidates| / |touched buckets|,
  * but the gate feeds are uniform. This probe runs the SAME per-batch op
  * bodies on a batch where 10% of the rows pile onto one hot spot:
  *
  *  - g10 shape: 10% of an arriving document batch carries the text of
  *    ONE corpus doc, so every hot row bands into that doc's buckets.
  *    The candidate set must grow like |hot rows| × 1 (each hot doc
  *    pairs with the one corpus doc sharing its bands) — linear in the
  *    batch, never |batch|² — and the verify join pays |candidates|.
  *  - g12 shape: 10% of a CDC batch redirected onto ONE orderkey bucket.
  *    The merge reads only touched partitions, so the skewed batch must
  *    touch FEWER partitions than the uniform one (the hot rows all land
  *    in one) and cost batch + touched-partition bytes either way.
  *
  * Timings are min-of-3 on the op body alone (the foreachBatch inner
  * logic, batch-shaped — feeder staging is ingest simulation and
  * excluded, exactly the op_s/sim_s split the bench reports).
  *
  * Usage: Test/runMain graft.GIngestSkewProbe [sfDir]
  */
object GIngestSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sf1data")
    val s = GraftSession.get("local[32]")
    import s.implicits._
    import graft.operators.Dedup
    import graft.functions.Text
    import graft.sources.{Roundtrip, Tables}

    def minOf3[A](body: => A): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

    // ---- g10: band-join ingest dedup under a hot band ----
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter($"doc_id" < Dedup.IncrSplit)
    val fresh = docs.filter($"doc_id" >= Dedup.IncrSplit)
      .filter($"doc_id" % 2 === 0) // one micro-batch's worth
    val corpusBands = Dedup.bandRowsOf(corpus).toDF("a_id", "bi", "bh")
      .localCheckpoint(true)
    val corpusSh = corpus.withColumn("toks", Text.tokens($"text"))
      .select($"doc_id".as("a_id"),
        array_distinct(Text.shingles($"toks")).as("a_sh"))
      .localCheckpoint(true)
    val hotText = corpus.orderBy($"doc_id").select($"text").head().getString(0)

    def g10Body(batch: DataFrame): (Long, Long) = {
      val bb = Dedup.bandRowsOf(batch).toDF("b_id", "bi", "bh")
      val cand = corpusBands.join(bb, Seq("bi", "bh"))
        .select($"a_id", $"b_id").distinct().localCheckpoint(true)
      val nCand = cand.count()
      val candIds = cand.select($"b_id".as("doc_id")).distinct()
      val bsh = batch.join(graft.plans.Hints.maybeBroadcast(candIds), "doc_id")
        .withColumn("toks", Text.tokens($"text"))
        .select($"doc_id".as("b_id"),
          array_distinct(Text.shingles($"toks")).as("b_sh"))
      val scored = cand.join(corpusSh, "a_id").join(bsh, "b_id")
        .select($"b_id".as("doc_id"), $"a_id".as("dup_of"),
          round(size(array_intersect($"a_sh", $"b_sh")) * lit(1.0) /
            size(array_union($"a_sh", $"b_sh")), 6).as("jaccard"))
        .filter($"jaccard" >= Dedup.IncrJaccard)
      val w = Window.partitionBy($"doc_id").orderBy($"jaccard".desc, $"dup_of")
      val n = scored.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).count()
      cand.unpersist()
      (nCand, n)
    }

    val uniformBatch = fresh.localCheckpoint(true)
    val nBatch = uniformBatch.count()
    val skewedBatch = fresh
      .withColumn("text",
        when($"doc_id" % 10 === 0, lit(hotText)).otherwise($"text"))
      .localCheckpoint(true)
    val hotRows = skewedBatch.filter($"text" === hotText).count()

    g10Body(uniformBatch) // warm
    val tU = minOf3(g10Body(uniformBatch))
    val (cU, _) = g10Body(uniformBatch)
    val tS = minOf3(g10Body(skewedBatch))
    val (cS, mS) = g10Body(skewedBatch)
    println(f"[gskew] g10 batch=$nBatch hotRows=$hotRows uniform: $tU%.2f s, $cU candidates")
    println(f"[gskew] g10 skewed:  $tS%.2f s, $cS candidates, $mS matches")
    // linearity: each hot row pairs with the ONE corpus doc sharing its
    // bands (plus stray band collisions), so candidates stay O(hot rows)
    // — a quadratic blowup would put cS near hotRows^2
    require(cS <= cU + 4 * hotRows + 100,
      s"hot-band candidates must stay linear in the batch: $cS vs $hotRows hot rows")

    // ---- g12: partitioned upsert under a hot bucket ----
    val bucketOf = pmod($"o_orderkey", lit(streaming.StreamOps.UpsertBuckets))
      .cast("int")
    val out = streaming.StreamRunner.stagingRoot(s, "gskew12_")
    Roundtrip.cdcBase(s, dir).withColumn("bucket", bucketOf)
      .write.mode("overwrite").partitionBy("bucket").parquet(out)
    val delta = Roundtrip.cdcDelta(s, dir).filter($"seq" === 1)
    // hot: 10% of the batch redirected onto orderkey bucket 0 (keys are
    // remapped INSIDE bucket 0's key space so last-op-wins stays valid)
    val hotDelta = delta.withColumn("o_orderkey",
      when($"o_orderkey" % 10 === 0,
        ($"o_orderkey" / 10).cast("long") * streaming.StreamOps.UpsertBuckets)
        .otherwise($"o_orderkey"))
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    def g12Body(d0: DataFrame): Int = {
      val d = d0.localCheckpoint(true)
      val touched = d.select(bucketOf.as("bucket")).distinct()
        .collect().map(_.getInt(0))
      val cur = s.read.parquet(out)
        .filter($"bucket".isin(touched.map(Integer.valueOf): _*))
      val merged = Roundtrip.applyCdc(cur.drop("bucket"), d)
        .withColumn("bucket", bucketOf).localCheckpoint(true)
      merged.write.mode("overwrite").partitionBy("bucket").parquet(out)
      merged.unpersist(); d.unpersist()
      touched.length
    }
    try {
      g12Body(delta) // warm
      val t12U = minOf3(g12Body(delta))
      val bU = g12Body(delta)
      val t12S = minOf3(g12Body(hotDelta))
      val bS = g12Body(hotDelta)
      println(f"[gskew] g12 uniform: $t12U%.2f s, $bU touched buckets")
      println(f"[gskew] g12 skewed:  $t12S%.2f s, $bS touched buckets")
      require(bS <= bU, "hot-bucket batch must touch no MORE partitions")
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    s.stop()
  }
}
