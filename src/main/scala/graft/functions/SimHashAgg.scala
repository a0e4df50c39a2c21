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
  * extension point): one 128-int vote buffer per group instead of 128
  * separate sum aggregates. Input is the md5 hex of the element (32
  * nibbles = the full 128 signature bits); output is `array(h1..h4)` of
  * sign-safe 32-bit halves — bit b set when vote_b >= 0 — with exactly
  * the same bit mapping as [[SimHash]]'s column/SQL forms, so the DuckDB
  * gate proves interchangeability.
  */
case class SimHashAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] =
    new Array[Int](SimHash.Bits)

  private def nibble(c: Byte): Int =
    if (c >= '0' && c <= '9') c - '0' else c - 'a' + 10

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String]
      require(hex.numBytes == 32,
        s"SimHashAgg input must be a full md5 hex digest (32 bytes); " +
          s"got ${hex.numBytes} bytes")
      // one decode per hex char (validation folded in), 4 votes per nibble;
      // (bit << 1) - 1 maps {0,1} -> {-1,+1} branch-free
      var k = 0
      while (k < 32) {
        val c = hex.getByte(k)
        require((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'),
          s"SimHashAgg input must be lowercase hex; got byte ${c.toInt} at $k")
        val nib = nibble(c)
        val base = k << 2
        buf(base) += (((nib >> 3) & 1) << 1) - 1
        buf(base + 1) += (((nib >> 2) & 1) << 1) - 1
        buf(base + 2) += (((nib >> 1) & 1) << 1) - 1
        buf(base + 3) += ((nib & 1) << 1) - 1
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < SimHash.Bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    val halves = new Array[Long](SimHash.Halves)
    var b = 0
    while (b < SimHash.Bits) {
      if (buf(b) >= 0) halves(b / 32) |= 1L << (31 - b % 32)
      b += 1
    }
    new GenericArrayData(halves)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(SimHash.Bits * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(SimHash.Bits)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SimHashAgg = copy(child = cs.head)
}

object SimHashAgg {
  /** Column API: aggregate an md5-hex column to `array(h1..h4)`. */
  def apply(md5Hex: Column): Column =
    bridge.column(SimHashAgg(bridge.expression(md5Hex)).toAggregateExpression())
}
