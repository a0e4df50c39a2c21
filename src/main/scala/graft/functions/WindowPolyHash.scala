package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: ALL stride-1 `k`-token window hashes of a
  * token array in one call — the d13 span-dedup hot path.
  *
  * Per token: md5 over the UTF-8 bytes, first two 32-bit digest words
  * u1/u2, two independent sub-2^31 universal hashes
  * `h1 = (u1*433 + u2*389 + 17) mod M1`, `h2 = (u1*541 + u2*499 + 29)
  * mod M2`, packed `h1 << 31 | h2`. Per window (start i, 0-based): two
  * parallel polynomial chains over the k packed words,
  * `acc1 = (acc1*B1 + h1) mod M1`, `acc2 = (acc2*B2 + h2) mod M2`,
  * result re-packed the same way — one BIGINT key with 62 effective
  * bits. Every intermediate stays under 2^62, so the identical
  * arithmetic replays exactly in DuckDB SQL (the d13 oracle's
  * `list_reduce` twin) — BIGINT-exact in both engines.
  *
  * Why an expression and not `transform`+`aggregate`: higher-order
  * functions evaluate interpreted per element (no codegen), and the
  * fold costs ~15 interpreted expression nodes × k per window; measured
  * at sf1 (50k docs) the HOF pipeline ran 13.5 s where the r9
  * md5-per-window HOF ran ~10 s. This native loop digests each token
  * ONCE and folds with primitive longs.
  */
case class WindowPolyHash(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_poly_hash expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    WindowPolyHash.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.WindowPolyHash.compute($a, $k);"
    })

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowPolyHash {
  /** Two sub-2^31 primes; products `acc*B + h` stay < 2^62. */
  val M1 = 2147483647L
  val M2 = 2147483629L
  val B1 = 1000003L
  val B2 = 999983L
  /** Per-token digest-word multipliers (u < 2^32, so u*mult < 2^43 —
    * the [[Text.MinhashP1]] discipline). */
  val P11 = 433L; val P12 = 389L; val C1 = 17L
  val P21 = 541L; val P22 = 499L; val C2 = 29L
  private val Mask = 2147483647L // 2^31 - 1

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, k: Int): UnsafeArrayData = {
    val n = toks.numElements()
    val nw = math.max(n - k + 1, 0)
    if (nw == 0 || n < k)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = digests.get()
    val packed = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      // big-endian unsigned 32-bit words, same as conv(substring(hex),16,10)
      val u1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val u2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val h1 = (u1 * P11 + u2 * P12 + C1) % M1
      val h2 = (u1 * P21 + u2 * P22 + C2) % M2
      packed(i) = (h1 << 31) | h2
      i += 1
    }
    val out = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      var a1 = 0L
      var a2 = 0L
      var j = w
      val end = w + k
      while (j < end) {
        val e = packed(j)
        a1 = (a1 * B1 + (e >>> 31)) % M1
        a2 = (a2 * B2 + (e & Mask)) % M2
        j += 1
      }
      out(w) = (a1 << 31) | a2
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-API entry point. */
  def apply(toks: Column, k: Int): Column =
    bridge.column(WindowPolyHash(bridge.expression(toks), k))
}
