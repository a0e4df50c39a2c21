package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter membership probe over an md5 digest column.
  *
  * The filter is a bitset baked into the expression as a reference
  * object (the PqEncode discipline): `words` is a long[] of
  * `numBits / 64` words — 16 Ki longs (128 KiB) for the d14 geometry
  * (m = 2^20), constant-size regardless of corpus size, shipped once
  * per task binary. The probe re-derives the SAME k positions the
  * filter was populated with — the k leading 32-bit words of the md5,
  * each reduced mod `numBits` (a power of two, so `& mask`) — exactly
  * the `conv(substring(hex, 8j+1, 8), 16, 10) % m` arithmetic the
  * DuckDB oracle replays (8 hex chars = 4 digest bytes, big-endian),
  * and returns true iff ALL k bits are set.
  *
  * Accepts the digest either as the 32-char lowercase hex string
  * (Spark's `md5()`) or as the 16-byte binary form (`unhex(md5())` —
  * preferred: half the shuffle bytes when the digest is also a join
  * key, and position extraction is 4 byte loads instead of 8 hex-char
  * parses). Inputs shorter than k words yield NULL.
  *
  * This replaces d14's explode(k positions) → join(pos table) →
  * re-group probe plan: that shape shuffled k×|test grams| rows and
  * paid an extra exchange per probe pass, where a Bloom probe is
  * per-row arithmetic against a memory-resident bitset — which is the
  * entire point of the structure at 100 TB (the filter stays ~128 KiB
  * while the exact gram set does not). The probe is a pure projection
  * inside whole-stage codegen: no join, no shuffle, no explode.
  *
  * Reference behavior: streamy-db has no sketch layer; this is part of
  * the training-data-pipeline surface (dedup gate d14).
  */
case class BloomProbe(child: Expression, words: Array[Long], k: Int,
    numBits: Long) extends UnaryExpression {

  require((numBits & (numBits - 1)) == 0L, "numBits must be a power of two")
  private val mask: Long = numBits - 1

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  private def isHex: Boolean = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects an md5 hex string or binary digest, got $t")
  }

  override def nullSafeEval(a: Any): Any = if (isHex) {
    val s = a.asInstanceOf[UTF8String]
    if (s.numBytes() < 8 * k) return null
    var j = 0
    var ok = true
    while (ok && j < k) {
      var p = 0L
      var h = 0
      while (h < 8) {
        val c = s.getByte(8 * j + h).toInt
        p = (p << 4) | (if (c <= '9') c - '0' else c - 'a' + 10)
        h += 1
      }
      val idx = (p & mask).toInt
      ok = (words(idx >>> 6) & (1L << (idx & 63))) != 0L
      j += 1
    }
    ok
  } else {
    val b = a.asInstanceOf[Array[Byte]]
    if (b.length < 4 * k) return null
    var j = 0
    var ok = true
    while (ok && j < k) {
      val p = ((b(4 * j) & 0xffL) << 24) | ((b(4 * j + 1) & 0xffL) << 16) |
        ((b(4 * j + 2) & 0xffL) << 8) | (b(4 * j + 3) & 0xffL)
      val idx = (p & mask).toInt
      ok = (words(idx >>> 6) & (1L << (idx & 63))) != 0L
      j += 1
    }
    ok
  }

  // NB: generated lines must never START with '|' — the codegen Block
  // pipeline strips margins, deleting the operator and producing
  // unparseable Java (the whole stage then silently falls back to
  // interpreted eval).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val ok = ctx.freshName("ok")
      if (isHex) s"""
        if ($a.numBytes() < ${8 * k}) {
          ${ev.isNull} = true;
        } else {
          boolean $ok = true;
          for (int $j = 0; $ok && $j < $k; $j++) {
            long $p = 0L;
            for (int $h = 0; $h < 8; $h++) {
              int $c = (int) $a.getByte(8 * $j + $h);
              $p = ($p << 4) | ($c <= '9' ? $c - '0' : $c - 'a' + 10);
            }
            int $idx = (int) ($p & ${mask}L);
            $ok = ($w[$idx >>> 6] & (1L << ($idx & 63))) != 0L;
          }
          ${ev.value} = $ok;
        }
      """ else s"""
        if ($a.length < ${4 * k}) {
          ${ev.isNull} = true;
        } else {
          boolean $ok = true;
          for (int $j = 0; $ok && $j < $k; $j++) {
            long $p = 0L;
            for (int $h = 0; $h < 4; $h++) {
              $p = ($p << 8) | ($a[4 * $j + $h] & 0xffL);
            }
            int $idx = (int) ($p & ${mask}L);
            $ok = ($w[$idx >>> 6] & (1L << ($idx & 63))) != 0L;
          }
          ${ev.value} = $ok;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbe {
  /** Column-API entry: build the bitset from collected set positions
    * (bounded at ≤ numBits rows by construction — positions are already
    * reduced mod numBits on the build side).
    */
  def apply(positions: Array[Long], k: Int, numBits: Long, mh: Column): Column = {
    val words = new Array[Long]((numBits >>> 6).toInt)
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      require(p >= 0 && p < numBits, s"position $p out of range [0, $numBits)")
      words((p >>> 6).toInt) |= 1L << (p & 63)
      i += 1
    }
    fromWords(words, k, numBits, mh)
  }

  /** Column-API entry from a pre-built word array (the
    * [[BloomBuildAgg]] output, collected as one 128 KiB row). */
  def fromWords(words: Array[Long], k: Int, numBits: Long,
      mh: Column): Column =
    bridge.column(BloomProbe(bridge.expression(mh), words, k, numBits))
}

/** Build side of [[BloomProbe]] as ONE aggregate pass: each task ORs the
  * k positions of every digest into a local `numBits/64`-long buffer, and
  * partials merge by OR — the exchange carries one 128 KiB buffer per
  * task instead of the explode→distinct shape this replaces (at sf10
  * that shape shuffled up to 2^20 rows per task and cost 6.7 s against
  * this aggregate's one scan). Input must be the 16-byte binary digest.
  */
case class BloomBuildAgg(child: Expression, k: Int, numBits: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require((numBits & (numBits - 1)) == 0L, "numBits must be a power of two")
  private val mask: Long = numBits - 1

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits >>> 6).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = v.asInstanceOf[Array[Byte]]
      if (b.length >= 4 * k) {
        var j = 0
        while (j < k) {
          val p = ((b(4 * j) & 0xffL) << 24) | ((b(4 * j + 1) & 0xffL) << 16) |
            ((b(4 * j + 2) & 0xffL) << 8) | (b(4 * j + 3) & 0xffL)
          val idx = (p & mask).toInt
          buf(idx >>> 6) |= 1L << (idx & 63)
          j += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BloomBuildAgg = copy(child = cs.head)
}

object BloomBuildAgg {
  /** Column API: OR-fold a binary digest column into the filter's word
    * array (array<long> of numBits/64). */
  def apply(mh: Column, k: Int, numBits: Long): Column =
    bridge.column(BloomBuildAgg(bridge.expression(mh), k, numBits)
      .toAggregateExpression())
}
