package graft

import graft.operators.{Dedup, Similarity, TextOps}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("t1 token counts are positive and bounded by char counts") {
    val joined = TextOps.t1(s, d)
      .join(sources.Tables.documents(s, d), "doc_id")
    assert(joined.filter(col("n_tokens") <= 0).count() == 0)
    assert(joined.filter(col("n_tokens") > col("n_chars")).count() == 0)
  }

  test("componentsOf: driver union-find fast path == distributed doubling loop") {
    import s.implicits._
    // chains (deep diameter), a clique, self-contained singleton pairs —
    // the shapes that distinguish min-label propagation bugs
    val edges = ((1L to 40L).sliding(2).map(w => (w(0), w(1))).toSeq ++
      Seq((100L, 103L), (103L, 101L), (101L, 102L), (100L, 102L),
        (200L, 201L), (300L, 300L), (50L, 45L))).toDF("a_id", "b_id")
    val local = Dedup.componentsOf(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // maxLocalEdges = -1 forces the distributed pointer-doubling loop
    val dist = Dedup.componentsOf(edges, maxLocalEdges = -1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local == dist)
    assert(local(40L) == 1L && local(102L) == 100L && local(201L) == 200L)
    assert(local(300L) == 300L && local(45L) == 45L && local(50L) == 45L)
  }

  test("t2 quality components stay in [0,1]") {
    val bad = TextOps.t2(s, d).filter(
      col("punct_ratio") < 0 || col("punct_ratio") > 1 ||
        col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
        col("quality") < 0 || col("quality") > 1)
    assert(bad.count() == 0)
  }

  test("d2 LSH candidates all verify above 0.8 jaccard on this corpus") {
    // the planted near-dups are ~0.98 jaccard; LSH-with-9-sigs should
    // produce no false positives here
    val low = Dedup.d3(s, d).filter(col("jaccard") < 0.8)
    assert(low.count() == 0)
    assert(Dedup.d2(s, d).count() > 0)
  }

  test("t12 rare fractions are consistent bounded ratios") {
    val r = TextOps.t12(s, d)
    assert(r.filter(col("n_rare") > col("n_tokens")).count() == 0)
    assert(r.filter(col("rare_frac") < 0 || col("rare_frac") > 1).count() == 0)
    assert(r.count() > 0)
  }

  test("d9 incremental matches are cross-split, verified, and one per new doc") {
    val r = Dedup.d9(s, d).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(1) < Dedup.IncrSplit), "dup_of must be corpus side")
    assert(r.forall(_.getLong(0) >= Dedup.IncrSplit), "doc_id must be new side")
    assert(r.forall(_.getDouble(2) >= Dedup.IncrJaccard))
    assert(r.map(_.getLong(0)).distinct.length == r.length, "one best match per doc")
    // d9's matches are exactly d3's verified cross-split pairs
    val d3cross = Dedup.d3(s, d)
      .filter(col("a_id") < Dedup.IncrSplit && col("b_id") >= Dedup.IncrSplit &&
        col("jaccard") >= Dedup.IncrJaccard)
      .select("b_id").distinct().count()
    assert(r.length.toLong == d3cross)
  }

  test("m6 frame energies are exact sums with peak bounds") {
    val r = Multimodal.m6(s, d)
    assert(r.filter(col("energy") < col("peak") * col("peak")).count() == 0)
    assert(r.filter(col("peak") <= 0).count() == 0)
    // frames per doc = ceil(len/32)
    val frames = r.groupBy("doc_id").count()
      .join(sources.Tables.documents(s, d), "doc_id")
      .filter(col("count") =!= ceil(length(col("text")) / Multimodal.AudioFrame.toDouble))
    assert(frames.count() == 0)
  }

  test("d6 groups: pairs share labels, labels are minima, singletons self-label") {
    val labels = Dedup.d6(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.d2(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across groups") }
    labels.groupBy(_._2).foreach { case (g, m) =>
      assert(m.keys.min == g, s"group $g label is not its min doc_id") }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.filterNot(kv => inPairs(kv._1)).foreach { case (id, g) =>
      assert(id == g, s"singleton $id labeled $g") }
  }

  test("d10 keeps the highest-quality member of every multi-member group") {
    val quality = TextOps.t2(s, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val groups = Dedup.d6(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val picks = Dedup.d10(s, d).collect()
    assert(picks.nonEmpty)
    val multi = groups.filter(_._2.size >= 2)
    assert(picks.length == multi.size, "one pick per multi-member group")
    picks.foreach { r =>
      val (g, keep, n) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val members = multi(g)
      assert(members.contains(keep) && n == members.size)
      val best = members.maxBy(id => (quality(id), -id))
      assert(keep == best, s"group $g kept $keep, best is $best")
    }
  }

  test("d11 components are consistent with d5 pairs and keep exactly one rep") {
    val labels = Dedup.d11(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val rep = labels.map(l => l._1 -> l._2).toMap
    val pairs = Dedup.d5(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(rep(a) == rep(b), s"pair ($a,$b) split across components") }
    labels.groupBy(_._2).foreach { case (g, m) =>
      assert(m.map(_._1).min == g, s"component $g rep is not its min id")
      assert(m.count(_._3) == 1 && m.find(_._3).get._1 == g,
        s"component $g must keep exactly its rep") }
  }

  test("t13 bigram counts agree with t1 token counts") {
    val nTok = TextOps.t1(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = TextOps.t13(s, d).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (id, nbg, fl) = (row.getLong(0), row.getLong(1), row.getDouble(2))
      assert(nbg == math.max(0L, nTok(id) - 1))
      assert(fl >= (if (nbg > 0) 1.0 else 0.0),
        s"doc $id fluency $fl below the every-bigram-occurs-once floor")
    }
  }

  test("t14 keep is exactly the conjunction of the rule flags") {
    val rows = TextOps.t14(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getBoolean(5) && r.getBoolean(6) &&
        r.getBoolean(7) && r.getBoolean(8)
      assert(r.getBoolean(9) == expect)
    }
    assert(rows.exists(_.getBoolean(9)), "gate should keep some docs")
  }

  test("t15 packing is gapless per shard with offsets from the running sum") {
    val rows = TextOps.t15(s, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, shard) =>
      var cum = 0L
      shard.sortBy(_._1).foreach { case (id, _, n, bin, off) =>
        assert(bin == cum / TextOps.PackBin, s"doc $id bin")
        assert(off == cum % TextOps.PackBin, s"doc $id offset")
        cum += n
      }
    }
  }

  test("m7 manifest pairs every doc that has an embedding, once") {
    val docs = sources.Tables.documents(s, d).select("doc_id")
    val embs = sources.Tables.embeddings(s, d)
      .selectExpr("vec_id AS doc_id")
    val expected = docs.join(embs, "doc_id").count()
    val m = Multimodal.queries("m7_paired_manifest")(s, d)
    assert(m.count() == expected && expected > 0)
    assert(m.filter(col("emb_norm") <= 0).count() == 0)
  }

  test("d4 simhash pairs equal the d2 candidate pairs on this corpus") {
    val d4p = Dedup.d4(s, d).select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d2p = Dedup.d2(s, d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d4p == d2p, s"simhash=${d4p.size} lsh=${d2p.size}")
  }

  // thresholds are measured-with-margin: with the Hamming<=3 probe ring
  // the bench reports s2 recall 0.96 at sf0.1 (was 0.66 at ring 2) and
  // s3 at 0.86-0.96 across SFs — a nearly-broken index cannot pass these
  test("s2 LSH ANN reaches recall >= 0.8 vs brute force") {
    val truth = Similarity.s1(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.s2(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("s3 IVF ANN reaches recall >= 0.7 vs brute force") {
    val truth = Similarity.s1(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.s3(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("s5 radius hits are true hits and complete enough vs brute force") {
    import graft.functions.Vec
    val e = sources.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < Similarity.NumQueries)
      .toDF("query_id", "q_emb")
    val truth = q.crossJoin(e.toDF("neighbor_id", "n_emb"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(Vec.cosineFast(col("q_emb"), col("n_emb")), 6))
      .filter(col("cos") >= Similarity.RadiusTau)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.s5(s, d).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), "radius results must be true radius hits")
    if (truth.nonEmpty)
      assert((truth & got).size.toDouble / truth.size >= 0.6,
        s"radius recall ${(truth & got).size}/${truth.size}")
  }

  test("s6 PQ equals a sequential JVM reference end-to-end") {
    import Similarity.{NumSub, SubDim, SubK, PqIters, NumQueries, TopK}
    val vecs = sources.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Double], aOff: Int, b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < SubDim) {
        val dd = a(aOff + i) - b(i); s0 += dd * dd; i += 1
      }
      s0
    }
    // seeds = subvectors of the SubK lowest vec_ids
    var cents = Array.tabulate(NumSub, SubK) { (m, c) =>
      vecs(c)._2.slice(m * SubDim, (m + 1) * SubDim)
    }
    def assignAll(): Array[Array[Int]] = vecs.map { case (_, e) =>
      Array.tabulate(NumSub) { m =>
        var best = 0; var bestD = d2(e, m * SubDim, cents(m)(0))
        var cid = 1
        while (cid < SubK) {
          val dd = d2(e, m * SubDim, cents(m)(cid))
          if (dd < bestD) { best = cid; bestD = dd } // ties keep lowest cid
          cid += 1
        }
        best
      }
    }
    for (_ <- 0 until PqIters) {
      val asg = assignAll()
      val next = cents.map(_.map(_.clone()))
      for (m <- 0 until NumSub; cid <- 0 until SubK) {
        val members = vecs.indices.filter(v => asg(v)(m) == cid)
        if (members.nonEmpty) { // empty cells keep previous coordinates
          for (dim <- 0 until SubDim) {
            var ticks = 0.0
            members.foreach { v =>
              ticks += math.floor(vecs(v)._2(m * SubDim + dim) * 1e6)
            }
            next(m)(cid)(dim) = (ticks / members.length) / 1e6
          }
        }
      }
      cents = next
    }
    val codes = assignAll()
    // Spark's round(_, 6) = HALF_UP over BigDecimal.valueOf
    def round6(v: Double): Double = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.toMap
    val expected = vecs.filter(_._1 < NumQueries).flatMap { case (qid, qe) =>
      val lut = Array.tabulate(NumSub, SubK) { (m, cid) =>
        math.floor(d2(qe, m * SubDim, cents(m)(cid)) * 1e6).toLong
      }
      val shortlist = vecs.indices.filter(v => vecs(v)._1 != qid)
        .map { v =>
          val ticks = (0 until NumSub)
            .map(m => lut(m)(codes(v)(m))).sum
          (vecs(v)._1, ticks)
        }
        .sortBy { case (nid, t) => (t, nid) }
        .take(Similarity.rerankDepth(vecs.length.toLong))
      shortlist
        .map { case (nid, _) => (nid, round6(cosine(qe, byId(nid)))) }
        .sortBy { case (nid, cos) => (-cos, nid) }
        .take(TopK).zipWithIndex
        .map { case ((nid, cos), i) => (qid, nid, cos, (i + 1).toLong) }
    }.toSet
    val got = Similarity.s6(s, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  test("g11 streaming PQ encode equals the stateless batch encode") {
    val (e, cents) = Similarity.pqTrain(s, d)
    val batch = e.select(col("vec_id"),
        posexplode(Similarity.pqEncode(cents, col("emb"))))
      .toDF("vec_id", "m", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val got = streaming.StreamOps.g11(s, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == batch && got.size == e.count() * Similarity.NumSub)
  }

  // raw ADC ranks alone measured ~0.28 recall here under an earlier,
  // narrower code width — the re-rank
  // stage is what buys the rest (shortlist 4×TopK, then exact cosine)
  test("s6 PQ + exact re-rank reaches recall >= 0.7 vs brute force") {
    val truth = Similarity.s1(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.s6(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("s8 IVF-PQ residual index reaches recall >= 0.6 vs brute force") {
    val truth = Similarity.s1(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.s8(s, d).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("s8 equals s3 when the ADC shortlist covers all probed candidates") {
    // at this corpus size rerankDepth(N) exceeds the per-query candidate
    // count, so the exact re-rank sees every probed-cell vector — the
    // composite must then return exactly the coarse-IVF answer (the PQ
    // stage orders the shortlist but cannot drop true candidates)
    val s3r = Similarity.s3(s, d).collect().map(_.toSeq).toSet
    val s8r = Similarity.s8(s, d).collect().map(_.toSeq).toSet
    assert(s8r == s3r && s8r.nonEmpty)
  }

  test("d12 rewrite equals a sequential strip-the-boilerplate reference") {
    import s.implicits._
    def md5hex(t: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = sources.Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect()
    val segOf = (toks: Seq[String]) => toks.grouped(Dedup.SegTokens).toSeq
    val boiler = docs
      .flatMap { case (id, toks) =>
        segOf(toks).filter(_.size == Dedup.SegTokens)
          .map(g => (g.mkString(" "), id)) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expect = docs.map { case (id, toks) =>
      val kept = segOf(toks)
        .filter(g => g.size < Dedup.SegTokens || !boiler(g.mkString(" ")))
        .flatten
      id -> ((kept.size.toLong, md5hex(kept.mkString(" "))))
    }.toMap
    val got = Dedup.d12(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == expect)
    assert(boiler.nonEmpty, "corpus should contain planted boilerplate")
  }

  test("t16 merges match a sequential reference BPE trainer") {
    val wf = sources.Tables.documents(s, d)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, n) => (-n, w) }.take(TextOps.BpeVocabCap)
    var vocab = wf.map { case (w, n) => (w.map(_.toString).toVector, n) }.toSeq
    val expect = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (round <- 1 to TextOps.BpeMergeRounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.toSeq
          .minBy { case ((pl, pr), c) => (-c, pl, pr) }
        expect += ((round, l, r, cnt))
        vocab = vocab.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          syms.foreach { x =>
            if (out.nonEmpty && out.last == l && x == r)
              out(out.length - 1) = l + r
            else out += x
          }
          (out.toVector, n)
        }
      }
    }
    val got = TextOps.t16(s, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expect.toSeq)
    assert(got.size == TextOps.BpeMergeRounds)
  }

  test("t17 epoch shuffle permutes each shard and actually shuffles") {
    val df = TextOps.t17(s, d)
    val bad = df.groupBy(col("lang")).agg(
        count(lit(1)).as("n"), max(col("pos")).as("mx"),
        countDistinct(col("pos")).as("np"))
      .filter(col("mx") =!= col("n") || col("np") =!= col("n"))
    assert(bad.isEmpty, "positions must be a 1..n permutation per shard")
    assert(df.filter(col("batch") =!=
      floor((col("pos") - 1) / TextOps.EpochBatch)).isEmpty)
    // the permutation must differ from plain doc_id order somewhere
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
    val moved = df.withColumn("idpos", row_number().over(w))
      .filter(col("idpos") =!= col("pos")).count()
    assert(moved > 0, "epoch shuffle should not be the identity order")
  }

  test("m3 stub features are deterministic and in [0,1]") {
    val a = Multimodal.m3(s, d).collect().sortBy(_.getLong(0))
    val b = Multimodal.m3(s, d).collect().sortBy(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.forall(r => (1 to 8).forall { i =>
      val v = r.getDouble(i); v >= 0.0 && v <= 1.0
    }))
  }

  test("t18 encode equals a sequential JVM-string BPE application") {
    import s.implicits._
    val (ca, cb) = ("\u0001", "\u0002")
    val merges = TextOps.t16(s, d).orderBy(col("round"))
      .select("lhs", "rhs").as[(String, String)].collect()
    assert(merges.length == TextOps.BpeMergeRounds)
    def encSyms(w: String): Long = {
      var str = w.map(c => s"$ca$c$cb").mkString
      merges.foreach { case (l, r) =>
        str = str.replace(s"$ca$l$cb$ca$r$cb", s"$ca$l$r$cb")
      }
      str.count(_ == '\u0001').toLong
    }
    val docToks = sources.Tables.documents(s, d)
      .select($"doc_id", graft.functions.Text.tokens($"text").as("toks"))
      .as[(Long, Seq[String])].collect()
    val expect = docToks.map { case (id, toks) =>
      id -> ((toks.map(_.length.toLong).sum, toks.map(encSyms).sum))
    }.toMap
    val got = TextOps.t18(s, d).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (id, nc, ns) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert((nc, ns) == expect(id), s"doc $id: ($nc,$ns) != ${expect(id)}")
      assert(ns <= nc && ns >= 1)
    }
  }

  test("t19 chunks tile every doc and hash the real token slices") {
    import s.implicits._
    val (cap, st) = (TextOps.ChunkTokens, TextOps.ChunkStride)
    val docToks = sources.Tables.documents(s, d)
      .select($"doc_id", graft.functions.Text.tokens($"text").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val rows = TextOps.t19(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    def md5hex(t: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val n = docToks(id).length.toLong
      assert(cs.length == ((n - 1) / st + 1).toInt, s"doc $id chunk count")
      cs.sortBy(_._2).zipWithIndex.foreach { case ((_, k, start, len, h), i) =>
        assert(k == i && start == k * st)
        assert(len == math.min(cap, n - start) && len >= 1)
        assert(h == md5hex(
          docToks(id).slice(start.toInt, (start + len).toInt).mkString(" ")))
      }
    }
    // every token position is covered by some chunk
    docToks.foreach { case (id, toks) =>
      if (toks.nonEmpty) {
        val covered = rows.filter(_._1 == id)
          .flatMap { case (_, _, start, len, _) => start until (start + len) }
          .toSet
        assert(covered == (0L until toks.length.toLong).toSet)
      }
    }
  }
}
