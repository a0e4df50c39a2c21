package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Element-wise fixed-point tick-sum aggregate over a vector column (the
  * [[KmvAgg]]/[[SimHashAgg]] TypedImperativeAggregate sibling): per
  * group, the exact integer sum of `floor(x_i * 1e6)` for every
  * dimension plus the row count, in ONE pass over the unexploded arrays.
  *
  * Why it exists (round 12): ivfTrain's Lloyd mean exploded the corpus
  * to (cid, dim, x) rows — 12.8M Generate rows + a (cid, dim) hash agg
  * per iteration, 7 s of the ~30 s sf10 build — to compute exactly this:
  * order-independent fixed-point per-dimension sums. The aggregate sums
  * primitive long arrays in place (O(dim) per row, map-side partial
  * aggregation ships one (dim+1)-long buffer per cell per partition), so
  * the per-iteration mean is corpus-scan-priced. The tick values are the
  * IDENTICAL `floor(x * 1e6)` longs the exploded form summed (Spark's
  * FLOOR(double) is math.floor → long) and integer addition is
  * order-free, so the downstream two-IEEE-division mean — and every
  * s3/s8 oracle replay — is bit-unmoved.
  *
  * Output: array(count, s_0, ..., s_{dim-1}) as longs.
  */
case class TickSumAgg(child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"tick_sum over $t")
  }

  // buf(0) = row count, buf(1+i) = sum of floor(x_i * 1e6)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim + 1)

  // Rows with fewer than `dim` elements are SKIPPED entirely (no count,
  // no ticks): the exploded (cid, dim) form this replaces counted rows
  // per present pair, so a short array contributing to buf(0) but not to
  // every dimension would shift the per-dimension mean denominator.
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      if (x.numElements() < dim) return buf
      buf(0) += 1L
      var i = 0
      while (i < dim) {
        val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        buf(1 + i) += math.floor(xi * 1e6).toLong
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): TickSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TickSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TickSumAgg = copy(child = cs.head)
}

object TickSumAgg {
  /** Column API: aggregate a float/double vector column of width `dim`
    * to array(count, tickSum_0, ..., tickSum_{dim-1}).
    */
  def apply(emb: Column, dim: Int): Column =
    bridge.column(TickSumAgg(bridge.expression(emb), dim)
      .toAggregateExpression())
}
