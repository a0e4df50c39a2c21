package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val Exact = DecimalType(30, 10)

    def time(name: String)(f: => Unit): Unit = {
      // warm + 3 reps
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name: min=${ts.min}%.3f avg=${ts.sum / 3}%.3f")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println("rows=" + li.count())

    time("scan_filter") {
      force(li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")))
    }
    time("q1_full")(force(Relational2.q1ref(spark, sfDir)))
    time("q1_double_sums") {
      force(li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .withColumn("disc_price", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"),
          sum($"l_extendedprice").as("sum_base_price"),
          sum($"disc_price").as("sum_disc_price"),
          sum($"disc_price" * (lit(1.0) + $"l_tax")).as("sum_charge"),
          avg($"l_quantity").as("avg_qty"),
          avg($"l_extendedprice").as("avg_price"),
          avg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order")))
    }
    time("q1_decimal18") {
      val E = DecimalType(18, 10)
      force(li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .withColumn("disc_price", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(E)).as("sum_qty"),
          sum($"l_extendedprice".cast(E)).as("sum_base_price"),
          sum($"disc_price".cast(E)).as("sum_disc_price"),
          sum(($"disc_price" * (lit(1.0) + $"l_tax")).cast(E)).as("sum_charge"),
          count(lit(1)).as("count_order")))
    }
    time("q1_one_dsum") {
      force(li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast(Exact)).as("sum_qty")))
    }

    // hi/lo split of the unscaled long: two plain long sums per measure
    import org.apache.spark.sql.catalyst.expressions.UnscaledValue
    import org.apache.spark.sql.graft.bridge
    val S = 1000000000L // 1e9
    def unscaled(c: org.apache.spark.sql.Column) =
      bridge.column(UnscaledValue(bridge.expression(c.cast(Exact))))
    def sumFast(c: org.apache.spark.sql.Column, scale: Int) = {
      val u = unscaled(c)
      val lo = pmod(u, lit(S))
      val hi = (u - lo) / lit(S)
      round((sum(hi.cast("long")).cast(DecimalType(38, 0)) * lit(S) +
        sum(lo.cast("long"))).cast(DecimalType(38, 10)) / lit(10000000000L), scale)
        .cast("double")
    }
    time("q1_fast_sums") {
      force(li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .withColumn("disc_price", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sumFast($"l_quantity", 2).as("sum_qty"),
          sumFast($"l_extendedprice", 2).as("sum_base_price"),
          sumFast($"disc_price", 2).as("sum_disc_price"),
          sumFast($"disc_price" * (lit(1.0) + $"l_tax"), 2).as("sum_charge"),
          count(lit(1)).as("count_order")))
    }
    // compare results exactly vs the decimal form
    val a = li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .withColumn("disc_price", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sumFast($"disc_price" * (lit(1.0) + $"l_tax"), 2).as("v"))
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    val b = li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .withColumn("disc_price", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(round(sum(($"disc_price" * (lit(1.0) + $"l_tax")).cast(Exact)), 2)
        .cast("double").as("v"))
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    println("SCRATCH equal=" + (a == b))
    println(a.take(3).mkString(" | "))
    spark.stop()
  }
}

/** Alias so Scratch can call the production q1. */
object Relational2 {
  def q1ref(s: SparkSession, dir: String) = operators.Relational.q1(s, dir)
}
