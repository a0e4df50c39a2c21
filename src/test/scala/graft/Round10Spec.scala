package graft

import graft.operators.{Relational, Similarity}
import graft.sources.{Roundtrip, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions: q47 (Q18 shape), h10 (z-order layout + 2-D
  * skipping), g15 (streaming ANN serving).
  */
class Round10Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("q47 aggregates lineitem ONCE (aggregate-then-join, no IN re-agg)") {
    val p = Relational.q47(s, d).queryExecution.executedPlan.toString
    // one partial+final pair on l_orderkey; a second aggregation over
    // lineitem would show four HashAggregate nodes with sum(l_quantity)
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs == 2, s"expected 2 HashAggregate nodes (partial+final), got $aggs")
  }

  test("q47 matches an independent driver-side computation") {
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_quantity").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => BigDecimal(r.getDouble(1))).sum).toMap
      .filter(_._2 > Relational.Q47MinQty)
    val got = Relational.q47(s, d).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getLong(2)).toSet.subsetOf(li.keySet))
    // descending totalprice with orderkey tiebreak
    val keys = got.map(r => (-r.getDouble(4), r.getLong(2))).toSeq
    assert(keys == keys.sorted)
  }

  test("zOrderKey interleaves bits (u even lanes, v odd lanes)") {
    import s.implicits._
    val rows = Seq((0L, 0L), (255L, 0L), (0L, 255L), (5L, 3L), (170L, 85L))
      .toDF("u", "v")
      .select(Roundtrip.zOrderKey(col("u"), col("v")).as("z"))
      .collect().map(_.getLong(0))
    def interleave(u: Long, v: Long): Long =
      (0 until 8).map(i => (((u >> i) & 1L) << (2 * i)) |
        (((v >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val exp = Seq((0L, 0L), (255L, 0L), (0L, 255L), (5L, 3L), (170L, 85L))
      .map((interleave _).tupled)
    assert(rows.toSeq == exp)
    // u occupies even bit lanes only: z(255,0) = 0x5555
    assert(interleave(255L, 0L) == 0x5555L && interleave(0L, 255L) == 0xaaaaL)
  }

  test("h10 equals the direct box filter, and z-files carry tight boxes") {
    import s.implicits._
    val got = Roundtrip.h10(s, d)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .collect().map(_.toSeq).toSet
    val ev = Tables.events(s, d)
    val r = ev.agg(min("user_id"), max("user_id")).head()
    val (umin, umax) = (r.getLong(0), r.getLong(1))
    val span = math.max(umax - umin, 1L)
    val exp = ev.filter($"user_id".between(umin + span / 4, umin + span / 2)
        && $"value" >= Roundtrip.H10MinValue)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .collect().map(_.toSeq).toSet
    assert(got == exp && got.nonEmpty)

    // layout evidence: replicate h10's write, then per-file user_id spans
    // must be fractions of the domain (each z-range file covers a small
    // 2-D box, which is what parquet min/max stats prune on)
    val out = java.nio.file.Files.createTempDirectory("graft_zspec_").toString
    val vr = ev.agg(min("value"), max("value")).head()
    val (vmin, vmax) = (vr.getDouble(0), vr.getDouble(1))
    val ub = least(floor(($"user_id" - umin) * 256 / (span + 1)), lit(255L))
    val vb = least(floor(($"value" - vmin) * 256.0 /
      math.max(vmax - vmin, 1e-9)), lit(255L)).cast("long")
    ev.select($"event_id", $"user_id", $"value")
      .withColumn("z", Roundtrip.zOrderKey(ub, vb))
      .repartitionByRange(8, $"z").sortWithinPartitions($"z").drop("z")
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val spans = files.map { f =>
      val m = s.read.parquet(f.getAbsolutePath)
        .agg(min("user_id"), max("user_id")).head()
      (m.getLong(1) - m.getLong(0)).toDouble / span
    }
    assert(files.length >= 4, s"expected >=4 z-range files, got ${files.length}")
    assert(spans.count(_ <= 0.55) >= files.length / 2,
      s"z-order should box user_id; spans: ${spans.map(x => f"$x%.2f").mkString(",")}")
    files.foreach(_ => ())
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(out))
  }

  test("g16 streamed quality gate equals the batch t14 verdicts") {
    val got = streaming.StreamOps.g16(s, d).collect().map(_.toSeq).toSet
    val exp = operators.TextOps.t14(s, d).collect().map(_.toSeq).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("g15 streamed ANN serving equals the one-shot s6 run") {
    val got = streaming.StreamOps.g15(s, d)
      .collect().map(_.toSeq).toSet
    val exp = Similarity.s6(s, d)
      .collect().map(_.toSeq).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("g17 streamed KMV state equals the batch KmvAgg over the stream") {
    import s.implicits._
    val got = streaming.StreamOps.g17(s, d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val k = streaming.StreamOps.StreamKmvK
    val sk = Tables.events(s, d)
      .select($"event_type",
        conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .groupBy($"event_type")
      .agg(graft.functions.KmvAgg(col("h"), k).as("sk"))
      .select($"event_type",
        round(when(element_at($"sk", 2).isNull || element_at($"sk", 2) === 0L,
          element_at($"sk", 1).cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) /
            element_at($"sk", 2).cast("double")), 4).as("approx_users"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == sk && got.nonEmpty)
  }

  test("q59 sketch is partitioning-invariant (mergeable state object)") {
    import s.implicits._
    val k = Relational.QSketchK
    val cents = expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    val hv = conv(substring(md5(concat(lit("q59"), cents.cast("string"))),
      1, 8), 16, 10).cast("long")
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"l_returnflag")
      .agg(graft.functions.QuantileSketchAgg(hv, cents, k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    val base = Tables.lineitem(s, d)
    // one partition vs many arbitrary hash partitions: identical sample
    // AND identical exact counts — the mergeability invariant
    val one = sketch(base.coalesce(1))
    val many = sketch(base.repartition(13, $"l_partkey"))
    assert(one == many && one.nonEmpty)
  }

  test("q59 estimates land within 5% rank error of the exact quantiles") {
    import s.implicits._
    val est = Relational.q59(s, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val li = Tables.lineitem(s, d)
      .select($"l_returnflag", $"l_extendedprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    li.foreach { case (flag, xs) =>
      val (p50, p95) = est(flag)
      // rank error: fraction of values below the estimate vs target rank
      def rankOf(v: Double) = xs.count(_ <= v).toDouble / xs.length
      assert(math.abs(rankOf(p50) - 0.50) < 0.05,
        s"$flag p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p95) - 0.95) < 0.05,
        s"$flag p95 rank ${rankOf(p95)}")
    }
  }

  test("g18 streamed quantile sketch equals the batch QuantileSketchAgg") {
    import s.implicits._
    val got = streaming.StreamOps.g18(s, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val k = streaming.StreamOps.StreamQSketchK
    val grid = expr("CAST(round(value * 10000) AS BIGINT)")
    val hv = conv(substring(md5(concat(lit("g18"), grid.cast("string"))),
      1, 8), 16, 10).cast("long")
    val sk = Tables.events(s, d).filter($"value".isNotNull)
      .groupBy($"event_type")
      .agg(graft.functions.QuantileSketchAgg(hv, grid, k).as("sk"))
      .select($"event_type", explode($"sk").as("e"))
      .select($"event_type", $"e.v".as("v"), $"e.c".as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val exp = sk.withColumn("cum", sum($"c").over(w))
      .withColumn("n", sum($"c").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_type")))
      .groupBy($"event_type")
      .agg((min(when($"cum" * 2 >= $"n", $"v")) / 10000.0).as("p50_est"),
        (min(when($"cum" * 20 >= $"n" * 19, $"v")) / 10000.0).as("p95_est"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == exp && got.nonEmpty)
  }
}
