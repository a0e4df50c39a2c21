package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
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
    val est = estimate(df.queryExecution.optimizedPlan)
    if (est <= maxBytes) broadcast(df) else df
  }

  /** Plan-time size estimate that sizes the side AS JOINED, not as the
    * product of its inputs. Spark's non-CBO stats visitor estimates a
    * Join as `left.sizeInBytes × right.sizeInBytes`, so a dimension that
    * is itself decorated by a tiny key-join (supplier ⋈ nation for the
    * nation name, customer ⋈ nation ⋈ region for a region filter) blows
    * up to petabytes on paper and the guard stands down — at sf100 that
    * false stand-down cost q43 a third full-fact exchange
    * (docs/SF100_r14.md §4). Every [[maybeBroadcast]] call site joins on
    * a key that is unique on at least one side, so output rows ≤ the
    * larger input and bytes ≤ the SUM of the joined inputs; the
    * recursion replaces the product with that sum and trusts Spark's own
    * width-scaled estimate (file bytes × projected-width ratio) for
    * join-free subtrees. Still an overestimate for filtered dims — safe
    * direction for an OOM guard. NOT safe for many-to-many joins; the
    * guard's contract is dimension-shaped sides.
    */
  private[graft] def estimate(plan: LogicalPlan): BigInt = plan match {
    case j: Join => estimate(j.left) + estimate(j.right)
    case p if p.children.isEmpty => p.stats.sizeInBytes
    case p if !p.exists(_.isInstanceOf[Join]) => p.stats.sizeInBytes
    case p => p.children.map(estimate).sum
  }
}
