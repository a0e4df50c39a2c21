package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom-filter membership probe over an md5 hex digest column.
  *
  * The filter is a bitset baked into the expression as a reference
  * object (the PqEncode discipline): `words` is a long[] of
  * `numBits / 64` words — 16 KiB of longs for the d14 geometry
  * (m = 2^20), constant-size regardless of corpus size, shipped once
  * per task binary. The probe re-derives the SAME k positions the
  * filter was populated with — the k leading 32-bit words of the hex
  * digest, each reduced mod `numBits` (a power of two, so `& mask`) —
  * exactly the `conv(substring(mh, 8j+1, 8), 16, 10) % m` arithmetic
  * the Spark build side and the DuckDB oracle share, and returns true
  * iff ALL k bits are set.
  *
  * This replaces d14's explode(k positions) → join(pos table) →
  * re-group probe plan: that shape shuffled k×|test grams| rows and
  * paid an extra exchange per probe pass, where a Bloom probe is
  * per-row arithmetic against a memory-resident bitset — which is the
  * entire point of the structure at 100 TB (the filter stays ~128 KiB
  * while the exact gram set does not). The probe is a pure projection
  * inside whole-stage codegen: no join, no shuffle, no explode.
  *
  * Precondition: the input is a 32-char lowercase hex md5 (Spark's
  * `md5()` and DuckDB's `md5()` both emit this); inputs shorter than
  * 8·k hex chars yield NULL.
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

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects a hex string, got $t")
  }

  override def nullSafeEval(a: Any): Any = {
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
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val ok = ctx.freshName("ok")
      s"""
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
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbe {
  /** Column-API entry: build the bitset from the collected set
    * positions (bounded at ≤ numBits rows by construction — positions
    * are already reduced mod numBits on the build side).
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
    bridge.column(BloomProbe(bridge.expression(mh), words, k, numBits))
  }
}
