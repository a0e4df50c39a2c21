package graft

import graft.operators.Relational
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q55-q58 (the Q9/Q11/Q16/Q19 TPC-H shapes) and the round-10
  * deterministic sketch upgrades (q23 KMV / q27 sampled quantiles).
  * Driver-side replays at sf0.001 pin the semantics; the DuckDB hash
  * gate is the cross-engine check.
  */
class Tpch2ShapesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def dec10(x: Double): BigDecimal =
    BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)

  test("q55 equals the driver-side exact-decimal profit replay") {
    val part = Tables.part(s, d).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_name"), r.getAs[Double]("p_retailprice"))).toMap
    val nation = Tables.nation(s, d).collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val supp = Tables.supplier(s, d).collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        nation(r.getAs[Int]("s_nationkey"))).toMap
    // o_orderdate arrives as LocalDateTime or java.sql.Timestamp depending
    // on which suite touched the shared session's NTZ conf first
    val oyear = Tables.orders(s, d).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> (r.getAs[Any]("o_orderdate") match {
        case t: java.time.LocalDateTime => t.getYear.toLong
        case t: java.sql.Timestamp => t.toLocalDateTime.getYear.toLong
      })).toMap
    val exp = Tables.lineitem(s, d).collect()
      .flatMap { r =>
        val (pname, retail) = part(r.getAs[Long]("l_partkey"))
        if (!pname.contains("gear")) None
        else Some((supp(r.getAs[Long]("l_suppkey")),
          oyear(r.getAs[Long]("l_orderkey"))) ->
          dec10(r.getAs[Double]("l_extendedprice") *
              (1.0 - r.getAs[Double]("l_discount")) -
            0.6 * retail * r.getAs[Double]("l_quantity")))
      }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .toMap
    val got = Relational.q55(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    assert(got == exp && got.nonEmpty)
  }

  test("q56 keeps exactly the parts above the threshold share") {
    import s.implicits._
    val rows = Relational.q56(s, d).collect()
    assert(rows.nonEmpty)
    // recompute the unfiltered per-part value + total with the same ops
    val nations = Seq("NATION_3", "NATION_8", "NATION_12")
    val sup = Tables.supplier(s, d)
      .join(Tables.nation(s, d), $"s_nationkey" === $"n_nationkey")
      .filter($"n_name".isin(nations: _*)).select($"s_suppkey")
    val value = Tables.lineitem(s, d)
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(Portable.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val total = value.values.map(dec10(_)).sum
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = value.filter { case (_, v) => v > 1.5 * (total / value.size) }
    assert(rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap == exp)
    assert(exp.size < value.size, "threshold should prune some parts")
  }

  test("q57 supplier counts replay driver-side and exclusions hold") {
    val complaints = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).collect()
      .map(_.getAs[Long]("s_suppkey")).toSet
    val part = Tables.part(s, d).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
          r.getAs[Int]("p_size"))).toMap
    val sizes = Set(1, 4, 9, 14, 19, 24, 29, 34)
    val exp = Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (pk, sk) =>
        val (b, t, z) = part(pk)
        !complaints(sk) && b != "Brand#5" && t != "PROMO" && sizes(z)
      }
      .groupBy { case (pk, _) => part(pk) }.view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val got = Relational.q57(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(got == exp && got.nonEmpty)
  }

  test("q58 equals the driver-side OR-chain replay") {
    val part = Tables.part(s, d).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_brand"), r.getAs[Int]("p_size"))).toMap
    val hits = Tables.lineitem(s, d).collect().flatMap { r =>
      val (b, z) = part(r.getAs[Long]("l_partkey"))
      val q = r.getAs[Double]("l_quantity")
      val in = (b == "Brand#12" && z >= 1 && z <= 5 && q >= 1 && q <= 11) ||
        (b == "Brand#23" && z >= 1 && z <= 10 && q >= 10 && q <= 20) ||
        (b == "Brand#3" && z >= 1 && z <= 15 && q >= 20 && q <= 30)
      if (in) Some(dec10(r.getAs[Double]("l_extendedprice") *
        (1.0 - r.getAs[Double]("l_discount"))))
      else None
    }
    val exp = hits.sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val got = BigDecimal(Relational.q58(s, d).head().getDouble(0))
    assert(got == exp && hits.nonEmpty)
  }

  test("KmvAgg keeps the K smallest distinct hashes with exact underfull") {
    import s.implicits._
    val vals = Seq(9L, 3L, 3L, 7L, 1L, 12L, 5L, 1L, 8L)
    val df = vals.toDF("h").repartition(3)
    val r4 = df.agg(graft.functions.KmvAgg(col("h"), 4)).head()
      .getSeq[Any](0)
    val distinct = vals.distinct.sorted // 1,3,5,7,8,9,12
    assert(r4 == Seq(4L, distinct(3))) // saturated: n=K, kth=4th smallest
    val r10 = df.agg(graft.functions.KmvAgg(col("h"), 10)).head()
      .getSeq[Any](0)
    assert(r10 == Seq(distinct.size.toLong, null)) // underfull: exact n
  }

  test("q23 reports the exact prefix-distinct count for underfull groups") {
    import s.implicits._
    // per-flag distinct l_partkey at sf0.001 is far below K=2048, so the
    // estimate must equal the exact count of distinct 32-bit md5 prefixes
    val exact = Tables.lineitem(s, d)
      .select($"l_returnflag",
        substring(md5($"l_partkey".cast("string")), 1, 8).as("hx"))
      .distinct()
      .groupBy($"l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val got = Relational.q23(s, d).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("approx_parts")).toMap
    assert(got == exact)
  }

  test("q27 quantiles are exact ranks of the deterministic sample") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(key: String): Long = {
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val sample = Tables.lineitem(s, d)
      .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .collect()
      .filter { r =>
        u32(s"q27${r.getLong(2)}_${r.get(3)}") < Relational.Q27Thr
      }
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    val got = Relational.q27(s, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    sample.foreach { case (flag, xs) =>
      val n = xs.length
      val (p50, p95) = got(flag)
      assert(p50 == xs(((n - 1) * 50) / 100), s"$flag p50")
      assert(p95 == xs(((n - 1) * 95) / 100), s"$flag p95")
    }
    assert(got.keySet == sample.keySet && got.nonEmpty)
  }
}
