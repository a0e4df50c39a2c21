package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into `private[sql]` internals (hence the package): rebuilds a
  * just-checkpointed DataFrame's `LogicalRDD` leaf with sane statistics.
  *
  * Why: `Dataset.localCheckpoint` carries the ORIGIN plan's estimated
  * stats into the checkpoint leaf. Estimated join stats are products of
  * child sizes, so in an iterative loop (checkpoint → join → checkpoint →
  * …) the carried `sizeInBytes` grows multiplicatively with iteration
  * count: by a few hundred rounds the BigInt has ~10^5-10^7 bits and every
  * downstream stats visit burns driver CPU in Karatsuba/Toom-Cook
  * multiplication — measured as minutes of driver time (and an apparent
  * hang) on the multi-key txn engine at sf1. The checkpoint has already
  * materialized the data, so the estimate is also pointless: we know the
  * exact cached size. This helper swaps the carried stats for the block
  * manager's measured size of the checkpointed RDD (falling back to the
  * origin estimate clamped to Long.MaxValue), which both bounds the BigInt
  * at 63 bits and gives the optimizer a BETTER broadcast signal than the
  * inflated product.
  */
object CheckpointBridge {

  def withMeasuredStats(ck: DataFrame): DataFrame = {
    val ds = ck.asInstanceOf[Dataset[Row]]
    val session = ds.sparkSession.asInstanceOf[SparkSession]
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val measured = session.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(math.max(i.memSize + i.diskSize, 1L)))
        val size = measured.getOrElse(
          lr.computeStats().sizeInBytes.min(BigInt(Long.MaxValue)))
        val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          session, Some(Statistics(sizeInBytes = size)), None)
        Dataset.ofRows(session, fresh)
      case _ => ck // not a checkpoint leaf: leave untouched
    }
  }
}
