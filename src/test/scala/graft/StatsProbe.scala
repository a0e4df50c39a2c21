package graft

import org.apache.spark.sql.functions._

/** Scratch probe (dev tool): does the a8 phase-loop shape accumulate
  * Catalyst sizeInBytes stats across localCheckpoint boundaries, and how
  * fast does the BigInt grow per phase?
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("local[4]")
    import s.implicits._
    var state = Seq(("a", "1")).toDF("key", "value").localCheckpoint(true)
    val other = Seq(("a", "x"), ("b", "y")).toDF("u_key", "u_value")
      .localCheckpoint(true)
    for (i <- 1 to 80) {
      val t0 = System.nanoTime()
      val failed = other
        .join(state, col("u_key") === col("key"), "left_outer")
        .filter(col("value").isNotNull)
        .select(col("u_key").as("f")).distinct()
      val up = other.join(failed, col("u_key") === col("f"), "left_anti")
      state = state.join(up, col("key") === col("u_key"), "full_outer")
        .select(coalesce(col("key"), col("u_key")).as("key"),
          coalesce(col("u_value"), col("value")).as("value"))
        .localCheckpoint(true)
      val bits = state.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      println(f"phase $i%3d  bits=$bits%10d  ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    s.stop()
  }
}
