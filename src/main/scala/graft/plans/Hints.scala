package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded join hints.
  *
  * A bare `broadcast(df)` hint OVERRIDES the optimizer: Spark will build
  * and ship the table no matter how big it turns out to be, and a
  * customer-scale dimension at 100 TB proportions (~2 TB) would OOM the
  * driver long before the hint's intent mattered. The guard consults
  * Catalyst's plan-time size estimate (file bytes for scans, propagated
  * width-scaled estimates for derived plans — no job is run) and only
  * attaches the hint when the estimate fits comfortably in an executor.
  * Past the bound the join is left to stats + AQE, which broadcast-convert
  * small sides at runtime anyway — so the hint is only ever an
  * optimization, never a scale hazard.
  *
  * Genuinely fixed-size dims (region: 5 rows, nation: 25 by schema
  * contract) keep their unconditional hints at the call sites; the guard
  * is for tables that GROW with the corpus (customer, supplier,
  * per-token vocabularies).
  */
object Hints {
  /** Default guard: well under Spark's 8 GB broadcast hard cap and sized
    * so the deserialized hash relation (~2-3× the on-disk estimate) still
    * fits beside a task's working set in a typical executor.
    */
  val DefaultMaxBroadcastBytes: Long = 512L << 20

  def maybeBroadcast(df: DataFrame,
      maxBytes: Long = DefaultMaxBroadcastBytes): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= maxBytes) broadcast(df) else df
  }
}
