package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the a8 multi-key path at an SF dir: workload
  * build, key metadata, conflict edges, component labeling, and the
  * component fold — to localize the sf10 cost.
  */
object A8Anatomy {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf10data"
    val s = GraftSession.get("local[32]")
    import s.implicits._
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val tds = t("workload+checkpoint") {
      operators.TxnQueries.multiKeyWorkloadDS(s, dir).localCheckpoint(true)
    }
    println(s"txns: ${tds.count()}")
    val flat = tds.toDF()
    val txnKeys = flat.select(col("txnId").as("txn_id"),
      explode(array_distinct(concat(
        transform(col("asserts"), a => a.getField("key")),
        transform(col("updates"), u => u.getField("key"))))).as("key"))
    val arity = txnKeys.groupBy(col("txn_id")).agg(count(lit(1)).as("nk"))
    val keyed = t("keyed materialize") {
      import graft.plans.Materialize.MaterializeOps
      txnKeys.join(arity, "txn_id")
        .select(col("txn_id"), col("key"), (col("nk") > 1).as("is_multi"))
        .materialize
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val edges = t("star edges") {
      val e = keyed.withColumn("src", min(col("txn_id")).over(w))
        .filter(col("src") =!= col("txn_id"))
        .select(col("src").as("a_id"), col("txn_id").as("b_id")).distinct()
        .localCheckpoint(true)
      println(s"  edges: ${e.count()}")
      e
    }
    val comp = t("componentsOf") {
      val c = operators.Dedup.componentsOf(edges).localCheckpoint(true)
      println(s"  labeled: ${c.count()}")
      c
    }
    t("full a8") {
      operators.TxnQueries.a8(s, dir).write.format("noop")
        .mode("overwrite").save()
    }
    s.stop()
  }
}
