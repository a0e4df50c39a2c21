package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{LongType, TimestampType}
import scala.collection.mutable.ArrayBuffer

/** Whole-operator extension demo (SURVEY §3 preference order (c)): a
  * bounded-time range join `left ⋈ right ON key AND right.t ∈ (left.t,
  * left.t + window]` as a first-class plan node.
  *
  * Spark's built-ins evaluate this as an equi-join on key plus a post
  * filter, buffering every same-key pair; this operator instead asks the
  * planner for co-clustered, (key, time)-sorted children (Spark inserts
  * the exchanges/sorts) and then streams a per-key two-pointer merge, so
  * per-task memory is one key's right-side rows, not the pair blow-up.
  * Keys must be LongType; times LongType or TimestampType (µs); null
  * keys/times don't match (inner-join semantics).
  */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    windowMicros: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): RangeJoinPlan = copy(left = l, right = r)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, lk, rk, lt, rt, w) =>
      RangeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, w) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    windowMicros: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val w = windowMicros
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val leftSchema = left.output
    val rightSchema = right.output
    left.execute().zipPartitions(right.execute()) { (lIt0, rIt0) =>
      val proj = UnsafeProjection.create(leftSchema ++ rightSchema,
        leftSchema ++ rightSchema)
      val joined = new JoinedRow
      val lIt = lIt0.buffered
      val rIt = rIt0.buffered

      new Iterator[InternalRow] {
        private var outBuf: Iterator[InternalRow] = Iterator.empty
        // right rows (copied) + times for the key currently being merged;
        // times are materialized to a plain Array ONCE per key so each left
        // row's binary search / emission is allocation-free (O(log R + hits))
        private val rRows = new ArrayBuffer[InternalRow]
        private val rTimesBuf = new ArrayBuffer[Long]
        private var rTimes: Array[Long] = Array.emptyLongArray
        private var curKey = 0L
        private var haveKey = false

        private def keyOf(row: InternalRow, e: Expression): java.lang.Long =
          e.eval(row).asInstanceOf[java.lang.Long]

        private def loadKey(k: Long): Unit = {
          rRows.clear(); rTimesBuf.clear()
          // skip right keys < k
          while (rIt.hasNext && {
            val rk = keyOf(rIt.head, rkB); rk == null || rk < k
          }) rIt.next()
          while (rIt.hasNext && {
            val rk = keyOf(rIt.head, rkB); rk != null && rk == k
          }) {
            val r = rIt.next()
            val t = rtB.eval(r)
            if (t != null) {
              rRows += r.copy()
              rTimesBuf += t.asInstanceOf[Long]
            }
          }
          rTimes = rTimesBuf.toArray
          curKey = k; haveKey = true
        }

        private def fill(): Unit = {
          while (!outBuf.hasNext && lIt.hasNext) {
            val l = lIt.next()
            val k = keyOf(l, lkB)
            val t0 = ltB.eval(l)
            if (k != null && t0 != null) {
              if (!haveKey || curKey != k.longValue()) loadKey(k)
              val lt = t0.asInstanceOf[Long]
              // first right index with time > lt (times sorted ascending)
              var lo = java.util.Arrays.binarySearch(rTimes, lt)
              if (lo < 0) lo = -lo - 1
              else { while (lo < rTimes.length && rTimes(lo) == lt) lo += 1 }
              var hi = lo
              while (hi < rTimes.length && rTimes(hi) <= lt + w) hi += 1
              if (hi > lo) {
                val lCopy = l.copy()
                outBuf = Iterator.range(lo, hi)
                  .map(i => proj(joined(lCopy, rRows(i))))
              }
            }
          }
        }

        override def hasNext: Boolean = { fill(); outBuf.hasNext }
        override def next(): InternalRow = { fill(); outBuf.next() }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): RangeJoinExec = copy(left = l, right = r)
}

/** DataFrame-level API for the custom operator. */
object RangeJoin {
  /** `left ⋈ right ON key AND right.time ∈ (left.time, left.time+window]`.
    * Column names refer to each side's own schema.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, windowMicros: Long): DataFrame = {
    def attr(df: DataFrame, name: String) =
      df.queryExecution.analyzed.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    def checkTypes(df: DataFrame, key: String, time: String): Unit = {
      require(attr(df, key).dataType == LongType, s"$key must be LongType")
      val t = attr(df, time).dataType
      require(t == LongType || t == TimestampType, s"$time must be time-like")
    }
    checkTypes(left, leftKey, leftTime)
    checkTypes(right, rightKey, rightTime)
    val plan = RangeJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(right, rightKey),
      attr(left, leftTime), attr(right, rightTime), windowMicros)
    bridge.ofRows(left.sparkSession, plan)
  }
}
