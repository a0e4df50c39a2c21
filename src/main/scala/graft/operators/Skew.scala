package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §4): when AQE's skew-join split isn't
  * enough (e.g. one key holds >10% of a fact table), salting spreads a hot
  * key across `salt` reducers by replicating the dimension side.
  */
object Skew {
  /** Salted inner equi-join: the (small) `right` side is replicated once
    * per salt bucket; `left` rows pick a deterministic bucket from a
    * tiebreak column, so the hot key's rows fan out over `salt` tasks.
    * Result set is identical to `left.join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      tiebreak: String, salt: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(col(tiebreak)), lit(salt)))
    val r = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
