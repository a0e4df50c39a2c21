package graft.plans

import org.apache.spark.sql.DataFrame

/** Checkpoint-with-sane-stats for iterative loops.
  *
  * Every `df.localCheckpoint(true)` inside a loop (the txn engine's phase
  * rounds, dedup's pointer-doubling, incremental-index merges) must go
  * through [[checkpoint]] instead: a plain localCheckpoint carries the
  * origin plan's ESTIMATED stats (multiplicative join products) into the
  * next iteration, so sizeInBytes grows by a data-proportional number of
  * bits per round and driver-side stats arithmetic eventually dominates
  * wall time (see CheckpointBridge for the measured failure). One-shot
  * checkpoints outside loops are unaffected either way.
  */
object Materialize {
  def checkpoint(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.CheckpointBridge.withMeasuredStats(
      df.localCheckpoint(true))

  /** `df.materialize` — drop-in replacement for `df.localCheckpoint(true)`
    * at loop-carried checkpoint sites.
    */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialize: DataFrame = checkpoint(df)
  }
}
