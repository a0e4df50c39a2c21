package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash aggregate (SURVEY §3 — the TypedImperativeAggregate
  * extension point): one 64-int vote buffer per group instead of 64
  * separate sum aggregates. Input is the md5 hex of the element; output is
  * `array(h1, h2)` — bit b set when vote_b >= 0 — with exactly the same
  * bit mapping as [[SimHash]]'s column/SQL forms, so the DuckDB gate
  * proves interchangeability.
  */
case class SimHashAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  private def nibble(c: Byte): Int =
    if (c >= '0' && c <= '9') c - '0' else c - 'a' + 10

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].getBytes
      require(hex.length == 32,
        s"SimHashAgg input must be a full md5 hex digest (32 bytes); " +
          s"got ${hex.length} bytes")
      var i = 0
      while (i < 16) {
        val c = hex(i)
        require((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'),
          s"SimHashAgg input must be lowercase hex; got byte ${c.toInt} at $i")
        i += 1
      }
      var b = 0
      while (b < 64) {
        val nib = nibble(hex(b / 4))
        val bit = (nib >> (3 - b % 4)) & 1
        buf(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var h1 = 0L; var h2 = 0L
    var b = 0
    while (b < 32) {
      if (buf(b) >= 0) h1 |= 1L << (31 - b)
      if (buf(b + 32) >= 0) h2 |= 1L << (63 - (b + 32))
      b += 1
    }
    new GenericArrayData(Array(h1, h2))
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SimHashAgg = copy(child = cs.head)
}

object SimHashAgg {
  /** Column API: aggregate an md5-hex column to `array(h1, h2)`. */
  def apply(md5Hex: Column): Column =
    bridge.column(SimHashAgg(bridge.expression(md5Hex)).toAggregateExpression())
}
