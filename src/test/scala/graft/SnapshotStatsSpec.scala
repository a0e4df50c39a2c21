package graft

import graft.operators.TxnQueries
import graft.sources.{Roundtrip, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** h11 (ANALYZE stats), h12 (manifest time travel), a14 (changelog
  * snapshot reads): driver-side replays at sf0.001.
  */
class SnapshotStatsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("h11 stats equal a per-column driver replay") {
    val li = Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_suppkey")
      .collect()
    val got = Roundtrip.h11(s, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_suppkey"))
    def stats(vals: Seq[Double]) =
      (li.length.toLong, 0L, vals.distinct.size.toLong, vals.min, vals.max)
    assert(got("l_quantity") == stats(li.map(_.getDouble(0)).toSeq))
    assert(got("l_discount") == stats(li.map(_.getDouble(2)).toSeq))
    assert(got("l_suppkey") == stats(li.map(_.getLong(3).toDouble).toSeq))
  }

  test("h12 time travel: every version reconstructs exactly, after later commits") {
    import s.implicits._
    val table = Roundtrip.h12Build(s, d)
    try {
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("o_orderkey").collect().map(_.getLong(0)).toSet
      val all = keys(o)
      // v1 read AFTER v2 and v3 were committed — time travel intact
      assert(keys(Roundtrip.readVersion(s, table, 1)) ==
        all.filter(_ % 3 == 0))
      assert(keys(Roundtrip.readVersion(s, table, 2)) ==
        all.filter(k => k % 3 == 0 || k % 3 == 1))
      // v3 is the copy-on-write delete of keys ≡ 0 (mod 9)
      assert(keys(Roundtrip.readVersion(s, table, 3)) ==
        all.filter(k => (k % 3 == 0 || k % 3 == 1) && k % 9 != 0))
      // v2's manifest carries v1's files untouched (append, not rewrite)
      val (m1, m2) = (Roundtrip.manifestFiles(table, 1).toSet,
        Roundtrip.manifestFiles(table, 2).toSet)
      assert(m1.subsetOf(m2) && m2.size > m1.size)
      // full-row check on the queried version
      val gotV2 = Roundtrip.readVersion(s, table, 2)
        .collect().map(_.toSeq).toSet
      val expV2 = o.filter($"o_orderkey" % 3 <= 1).collect().map(_.toSeq).toSet
      assert(gotV2 == expV2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(table))
    }
  }

  test("a14 snapshots equal last-writer-wins replays at each boundary") {
    val log = Tables.events(s, d)
      .select(col("event_id").as("txn_id"),
        concat(lit("k"), (col("user_id") % 40).cast("string")).as("key"),
        floor(col("value") * 100).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ids = log.map(_._1)
    val (lo, hi) = (ids.min, ids.max)
    val exp = (1L to 3L).flatMap { i =>
      val b = lo + (hi - lo) * i / 4
      log.filter(_._1 <= b).groupBy(_._2).map { case (k, rows) =>
        val (tid, _, v) = rows.maxBy(_._1)
        val value = if (v % 5 == 0) null else v.toString
        (i, k, value, tid)
      }
    }.toSet
    val got = TxnQueries.a14(s, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == exp && got.nonEmpty)
    // snapshot key sets grow monotonically with the boundary
    val bySnap = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(bySnap(1L).subsetOf(bySnap(2L)) && bySnap(2L).subsetOf(bySnap(3L)))
  }
}
