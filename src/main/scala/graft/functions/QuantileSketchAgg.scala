package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native MERGEABLE distinct-value quantile sketch (SURVEY §3 — the
  * [[KmvAgg]] sibling; Gibbons' distinct-sampling shape).
  *
  * State per group: the K pairs `(hv, v)` with the smallest hash `hv`
  * over the group's DISTINCT values `v`, each carrying the EXACT total
  * count of rows with that value — fixed `O(K)` memory per group on
  * both the map and reduce sides, with map-side partial aggregation.
  * Unlike a row sample (q27's shape), the retained set is a function of
  * the distinct-VALUE set only, so the sketch is an order-independent,
  * idempotent-merge state object: a value in the final K-min set can
  * never have been evicted from any partial (fewer than K smaller
  * hashes exist globally, hence in every partition), so its count sums
  * exactly across partials; a value evicted anywhere is provably not in
  * the final K-min set, so its lost count is irrelevant. That is the
  * property that lets the same state live inside
  * `flatMapGroupsWithState` for continuous streaming quantiles (g18)
  * with the streamed state provably equal to this batch aggregate.
  *
  * Determinism: ties on `hv` break by `v`, so another engine replays
  * the sketch with `row_number() OVER (ORDER BY hv, v) <= K` over the
  * distinct values — the full hash gate (like [[KmvAgg]]/q36, unlike
  * t-digest/KLL whose centroids depend on merge order).
  *
  * Input: `hv` (the 32-bit hash of the value, engine-portable md5
  * prefix) and `v` (the value on an integer grid, e.g. cents). Output:
  * `array<struct<v, c>>` sorted by `v` ascending; the weighted-quantile
  * rank walk stays OUTSIDE in plain integer column expressions so both
  * engines compare identical operands.
  */
case class QuantileSketchAgg(hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[(Long, Long), Long]] {

  override def children: Seq[Expression] = hash :: value :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  private def ord: java.util.Comparator[(Long, Long)] = QuantileSketchAgg.KeyOrd

  override def createAggregationBuffer(): java.util.TreeMap[(Long, Long), Long] =
    new java.util.TreeMap[(Long, Long), Long](ord)

  /** Add `c` observations of key `(hv, v)`, keeping only the K smallest
    * keys that can still be in the global K-min set. */
  private def insert(buf: java.util.TreeMap[(Long, Long), Long],
      key: (Long, Long), c: Long): Unit = {
    if (buf.containsKey(key)) { buf.put(key, buf.get(key) + c); () }
    else if (buf.size < k) { buf.put(key, c); () }
    else if (ord.compare(key, buf.lastKey()) < 0) {
      buf.put(key, c)
      buf.remove(buf.lastKey())
      ()
    }
  }

  override def update(buf: java.util.TreeMap[(Long, Long), Long],
      input: InternalRow): java.util.TreeMap[(Long, Long), Long] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      insert(buf, (h.asInstanceOf[Long], v.asInstanceOf[Long]), 1L)
    }
    buf
  }

  override def merge(b1: java.util.TreeMap[(Long, Long), Long],
      b2: java.util.TreeMap[(Long, Long), Long])
      : java.util.TreeMap[(Long, Long), Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(b1, e.getKey, e.getValue)
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[(Long, Long), Long]): Any = {
    // output ordering: by value ascending (the rank-walk order)
    val arr = new Array[(Long, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey._2, e.getValue)
      i += 1
    }
    java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int =
        java.lang.Long.compare(a._1, b._1)
    })
    new GenericArrayData(arr.map { case (v, c) =>
      new GenericInternalRow(Array[Any](v, c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.TreeMap[(Long, Long), Long])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey._1); bb.putLong(e.getKey._2); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeMap[(Long, Long), Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = createAggregationBuffer()
    var i = 0
    while (i < n) {
      m.put((bb.getLong, bb.getLong), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(hash = cs(0), value = cs(1))
}

object QuantileSketchAgg {
  /** `(hv, v)` lexicographic key order — the `ORDER BY hv, v` the
    * oracle replays. Top-level object so task closures serialize. */
  object KeyOrd extends java.util.Comparator[(Long, Long)]
      with Serializable {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val h = java.lang.Long.compare(a._1, b._1)
      if (h != 0) h else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Column API: aggregate `(hash, gridValue)` to the K-min
    * distinct-value sample `array<struct<v, c>>` sorted by `v`. */
  def apply(hash: Column, value: Column, k: Int): Column =
    bridge.column(QuantileSketchAgg(bridge.expression(hash),
      bridge.expression(value), k).toAggregateExpression())
}
