package graft

import graft.operators.{Dedup, TextOps, TxnQueries}
import graft.sources.{Roundtrip, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators: span-level substring dedup (d13), mixture
  * resampling (t20), MERGE upsert (h6) + its streaming twin (g12), and
  * changelog compaction (a13). Each spec checks the distributed result
  * against a sequential JVM reference or an independent invariant.
  */
class Round9Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def md5hex(t: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(t.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  test("d13 span dedup equals a sequential overlapping-window reference") {
    import s.implicits._
    val k = Dedup.SegTokens
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
      .as[(Long, Seq[String])].collect()
    val winsOf = (toks: Seq[String]) =>
      if (toks.size < k) Seq.empty[String]
      else (0 to toks.size - k).map(i => md5hex(toks.slice(i, i + k).mkString(" ")))
    val counts = docs.flatMap { case (_, t) => winsOf(t) }
      .groupBy(identity).map { case (h, o) => (h, o.length) }
    val expect = docs.map { case (id, toks) =>
      val dupPos = winsOf(toks).zipWithIndex
        .collect { case (h, p) if counts(h) >= 2 => p }
      // island merge: a gap > k starts a new span
      val islands = dupPos.foldLeft(List.empty[(Int, Int)]) {
        case ((lo, hi) :: rest, p) if p - hi <= k => (lo, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      val spans = islands.map { case (lo, hi) => hi - lo + k }
      (id, (toks.size.toLong, spans.length.toLong, spans.sum.toLong,
        if (spans.isEmpty) 0L else spans.max.toLong))
    }.toMap
    val got = Dedup.d13(s, d)
      .select(col("doc_id"), col("ntok"), col("n_spans"),
        col("dup_tokens"), col("max_span"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (id, ntok, ns, dt, mx) =>
      assert(expect(id) == ((ntok, ns, dt, mx)), s"doc $id")
    }
    // the corpus's planted near-dups must actually produce spans
    assert(got.count(_._4 > 0) > 0, "no duplicated spans found at all")
  }

  test("t20 mixture sample equals the exact-threshold reference") {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(graft.functions.Text.tokens(col("text"))).cast("long").as("n"))
      .as[(Long, String, Long)].collect()
    val perLang = toks.groupBy(_._2).map { case (l, r) => (l, r.map(_._3).sum) }
    val totalT = perLang.values.sum
    val nLang = perLang.size
    val budget = totalT / 2
    val thr = perLang.map { case (l, tl) =>
      (l, math.min(4294967296L,
        (budget * 4294967296L) / (nLang * math.max(tl, 1L))))
    }
    val expect = toks.map { case (id, lang, n) =>
      val frac = java.lang.Long.parseLong(md5hex(s"mix$id").take(8), 16)
      (id, (lang, n, frac < thr(lang)))
    }.toMap
    val got = TextOps.t20(s, d)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("keep"))
      .as[(Long, String, Long, Boolean)].collect()
    assert(got.length == expect.size)
    got.foreach { case (id, lang, n, keep) =>
      assert(expect(id) == ((lang, n, keep)), s"doc $id")
    }
    // any language at or under its uniform share must keep everything
    perLang.foreach { case (l, tl) =>
      if (tl * nLang <= budget)
        assert(got.filter(_._2 == l).forall(_._4), s"under-share lang $l")
    }
    // the sample must actually drop something (en is over-represented)
    assert(got.exists(!_._4), "nothing was downsampled")
  }

  test("h6 merge applies inserts, updates and deletes with seq precedence") {
    import s.implicits._
    val orig = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .as[(Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    val got = Roundtrip.h6(s, d)
      .as[(Long, Long, Double, String)].collect()
    val byKey = got.map(r => r._1 -> r).toMap
    assert(byKey.size == got.length, "duplicate keys after merge")
    orig.keys.foreach { k =>
      if (k % 9 == 0) assert(!byKey.contains(k), s"deleted key $k survives")
      else if (k % 7 == 0 && k % 10 != 0) {
        val r = byKey(k)
        assert(r._4 == "X" && r._3 == orig(k)._3 + 100.0, s"update lost on $k")
      } else {
        assert(byKey(k) == orig(k), s"untouched/inserted key $k changed")
      }
    }
    assert(byKey.keySet == orig.keySet.filterNot(_ % 9 == 0))
  }

  test("g12 streaming upsert equals batch h6") {
    import s.implicits._
    val h = Roundtrip.h6(s, d)
      .as[(Long, Long, Double, String)].collect().sorted
    val g = StreamOps.g12(s, d)
      .as[(Long, Long, Double, String)].collect().sorted
    assert(g.length == h.length)
    assert(g.sameElements(h))
  }

  test("a13 compaction keeps exactly each (segment, key)'s last write") {
    import s.implicits._
    val log = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).cast("long").as("seg"),
        concat(lit("k"), (col("user_id") % 40).cast("string")).as("key"),
        floor(col("value") * 100).cast("long").as("v"),
        col("ts").cast("long").as("tsl"), col("event_id"))
      .as[(Long, String, Long, Long, Long)].collect()
    val expect = log.groupBy(r => (r._1, r._2)).map { case (sk, rows) =>
      val last = rows.maxBy(r => (r._4, r._5))
      (sk, (if (last._3 % 5 == 0) null else last._3.toString, last._5))
    }
    val got = TxnQueries.queries("a13_log_compaction")(s, d)
      .select(col("seg_start").cast("long"), col("key"), col("value"),
        col("last_event_id"))
      .as[(Long, String, String, Long)].collect()
    assert(got.length == expect.size, "one row per (segment, key)")
    got.foreach { case (seg, key, v, eid) =>
      assert(expect((seg, key)) == ((v, eid)), s"($seg,$key)")
    }
    assert(got.exists(_._3 == null), "tombstones must be retained")
  }
}
