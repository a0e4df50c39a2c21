package graft

import graft.operators.Relational
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q50-q54: the Q4/Q12/Q14/Q15/Q6 TPC-H shapes. Each test checks the
  * query against an independent driver-side computation at sf0.001 (the
  * DuckDB hash gate is the cross-engine check; this pins the semantics).
  */
class TpchShapesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  import java.time.LocalDateTime

  // timestamp columns collect as LocalDateTime (NTZ inference on) or
  // java.sql.Timestamp (off — Tables.eventsRaw disables the inference
  // session-wide the first time ANY suite reads events, and sessions pin
  // UTC so the instants agree); normalize so this suite does not depend
  // on which suites ran before it
  private def ldt(r: org.apache.spark.sql.Row, i: Int): LocalDateTime =
    r.get(i) match {
      case t: java.sql.Timestamp => t.toLocalDateTime
      case t: LocalDateTime => t
      case other => fail(s"unexpected timestamp value: $other")
    }

  private lazy val orders = Tables.orders(s, d)
    .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    .collect()
    .map(r => (r.getLong(0), (ldt(r, 2), r.getString(3))))
    .toMap
  private lazy val lineitems = Tables.lineitem(s, d)
    .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
      "l_discount", "l_quantity")
    .collect()

  test("q50 counts exactly the orders with a >60-day-late lineitem") {
    val lateOrders = lineitems.filter { r =>
      orders.get(r.getLong(0)).exists { case (od, _) =>
        ldt(r, 2).isAfter(od.plusDays(60))
      }
    }.map(_.getLong(0)).toSet
    val lo = LocalDateTime.parse("1996-07-01T00:00")
    val hi = LocalDateTime.parse("1996-10-01T00:00")
    val exp = orders.toSeq
      .filter { case (k, (od, _)) =>
        !od.isBefore(lo) && od.isBefore(hi) && lateOrders(k)
      }
      .groupBy(_._2._2).view.mapValues(_.size.toLong).toMap
    val got = Relational.q50(s, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp && got.values.sum > 0)
  }

  test("q51 high+low counts partition the late-shipped 1996 lineitems") {
    val rows = Relational.q51(s, d).collect()
    val lo = LocalDateTime.parse("1996-01-01T00:00")
    val hi = LocalDateTime.parse("1997-01-01T00:00")
    val late = lineitems.filter { r =>
      val sd = ldt(r, 2)
      !sd.isBefore(lo) && sd.isBefore(hi) &&
        orders.get(r.getLong(0)).exists { case (od, _) =>
          sd.isAfter(od.plusDays(30))
        }
    }
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == late.length)
    val hiPri = late.count { r =>
      val p = orders(r.getLong(0))._2
      p == "1-URGENT" || p == "2-HIGH"
    }
    assert(rows.map(_.getLong(1)).sum == hiPri)
  }

  test("q52 promo share is the quotient of its own two sums") {
    val r = Relational.q52(s, d).head()
    val (promo, total, share) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0 && promo <= total && total > 0)
    assert(math.abs(share - 100.0 * promo / total) < 1e-4)
  }

  test("q53 returns exactly the argmax suppliers of the revenue view") {
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0)).view
      // replay the engine arithmetic: IEEE double product per row, THEN
      // the DECIMAL(30,10) cast (HALF_UP), exact sum, final round(.,2)
      .mapValues(rs => rs.map(r =>
        BigDecimal(r.getDouble(1) * (1.0 - r.getDouble(2)))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .toMap
    val mx = rev.values.max
    val exp = rev.filter(_._2 == mx).keySet
    val got = Relational.q53(s, d).collect()
    assert(got.map(_.getLong(0)).toSet == exp && got.nonEmpty)
    assert(got.forall(r => BigDecimal(r.getDouble(2)) == mx))
  }

  test("q54 equals the driver-side exact-decimal filtered sum") {
    val lo = LocalDateTime.parse("1996-01-01T00:00")
    val hi = LocalDateTime.parse("1997-01-01T00:00")
    val exp = lineitems.filter { r =>
      val sd = ldt(r, 2)
      !sd.isBefore(lo) && sd.isBefore(hi) &&
        r.getDouble(4) >= 0.05 && r.getDouble(4) <= 0.07 && r.getDouble(5) < 24
    }.map(r => BigDecimal(r.getDouble(3) * r.getDouble(4))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val got = BigDecimal(Relational.q54(s, d).head().getDouble(0))
    assert(got == exp)
  }
}
