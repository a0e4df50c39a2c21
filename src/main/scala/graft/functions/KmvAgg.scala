package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native K-minimum-values sketch aggregate (SURVEY §3 — the
  * TypedImperativeAggregate extension point, the [[SimHashAgg]] sibling).
  *
  * Maintains the K smallest DISTINCT 32-bit hash values per group in a
  * bounded sorted set: fixed `O(K)` memory per group on both the map and
  * reduce sides, with map-side partial aggregation (each partition trims
  * to its local K-min set before the shuffle). That is the property the
  * window-function KMV formulation (q36) lacks — the window sorts every
  * distinct hash in the group through the exchange, while this aggregate
  * ships at most K longs per partition regardless of corpus size: the
  * 100 TB distinct-sketch shape.
  *
  * The K-min distinct set is an order-independent function of the input
  * value set, so the result is deterministic and another engine can
  * replay it with a plain `row_number` window over distinct hashes —
  * which is exactly what the DuckDB oracle does, giving the sketch a
  * full hash gate (unlike HLL++, whose register layout is
  * engine-private).
  *
  * Input: the hash as a long in [0, 2^32). Output: `array(n, kth)` —
  * `n` = number of distinct hashes retained (= the exact distinct count
  * while the set is underfull, = K once saturated), `kth` = the K-th
  * smallest distinct hash when saturated, else null. The KMV estimate
  * `(K-1) / (kth / 2^32)` is left to the caller so the one division
  * stays a single visible IEEE op in both engines.
  */
case class KmvAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // keep only values that can still be among the K smallest
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size.toLong
    val kth: Any = if (buf.size == k) java.lang.Long.valueOf(buf.last()) else null
    new GenericArrayData(Array[Any](n, kth))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KmvAgg = copy(child = cs.head)
}

object KmvAgg {
  /** Column API: aggregate a `[0, 2^32)` hash column to `array(n, kth)`. */
  def apply(hash: Column, k: Int): Column =
    bridge.column(KmvAgg(bridge.expression(hash), k).toAggregateExpression())
}
