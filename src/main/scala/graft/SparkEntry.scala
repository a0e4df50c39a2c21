package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ Dedup.queries ++
      Similarity.queries ++ multimodal.Multimodal.queries ++
      TxnQueries.queries ++ streaming.StreamOps.queries ++
      sources.Roundtrip.queries

  /** DuckDB-equivalent SQL per query key (same column names — the driver
    * sorts columns by name before hashing). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ multimodal.Multimodal.oracles ++
      TxnQueries.oracles ++ streaming.StreamOps.oracles ++
      sources.Roundtrip.oracles
}
