package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Whole-document sketch kernels (SURVEY §3 — the native `Expression`
  * extension point, one step below the `TypedImperativeAggregate`s):
  * SimHash and MinHash signatures computed from the per-doc TOKEN array in
  * one imperative pass — sliding-window shingling, per-shingle md5 and the
  * vote/min loops all in plain JVM code. The aggregate formulations
  * ([[SimHashAgg]], [[Text.minhashSig]]) stay as the portable twins the
  * DuckDB oracles mirror — these kernels produce bit-identical signatures
  * (the gate hash-proves it) but turn the signature stage from
  * explode(~200x rows) -> partial agg -> EXCHANGE -> final agg into a
  * shuffle-free map: signatures never leave the scan stage, so at 100 TB
  * the only shuffled data is the (id, signature) table itself.
  *
  * Both kernels return a 0-or-1-element ARRAY, meant to be consumed with
  * `explode(...)`: the Generate operator evaluates the kernel exactly once
  * per row (a plain projection would be re-inlined into every consumer by
  * CollapseProject / predicate pushdown, re-running the md5 loop per
  * referencing column — measured 8x) and drops too-short documents with
  * the empty array, matching the exploded formulations' "doc absent"
  * behavior.
  *
  * `CodegenFallback` is deliberate: the kernel is hand-written JVM code
  * that generated code could not improve on.
  */
private[functions] abstract class ShingleKernel extends UnaryExpression
    with CodegenFallback {
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<string> of tokens, got $t")
    }

  protected val ShingleN = 3

  /** Distinct space-joined [[ShingleN]]-gram shingles of the token array
    * (distinctness never changes a min and is exactly the
    * `array_distinct` the SimHash oracle applies).
    */
  protected def distinctShingles(toks: ArrayData): java.util.ArrayList[String] = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[String]()
    if (n < ShingleN) return out
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - ShingleN) {
      sb.setLength(0)
      var k = 0
      while (k < ShingleN) {
        if (k > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + k).toString)
        k += 1
      }
      val s = sb.toString
      if (seen.add(s)) out.add(s)
      i += 1
    }
    out
  }
}

/** 128-bit SimHash over a doc's token array — `array(struct(h1..h4))` of
  * sign-safe 32-bit halves with exactly [[SimHashAgg]]'s bit mapping
  * (vote per digest bit, bit set when vote >= 0; bit 7-b%8 of raw digest
  * byte b/8 == the aggregate form's hex-nibble bit), or an empty array
  * for docs shorter than the shingle width.
  */
case class SimHashShingles(child: Expression) extends ShingleKernel {
  override def dataType: DataType = ArrayType(StructType(
    (1 to SimHash.Halves).map(i =>
      StructField(s"h$i", LongType, nullable = false))), containsNull = false)
  override protected def withNewChildInternal(c: Expression): SimHashShingles =
    copy(child = c)

  override def nullSafeEval(input: Any): Any = {
    val shingles = distinctShingles(input.asInstanceOf[ArrayData])
    if (shingles.isEmpty) return new GenericArrayData(Array.empty[Any])
    val md = ShingleSketches.md5()
    val votes = new Array[Int](SimHash.Bits)
    var i = 0
    while (i < shingles.size) {
      val digest = md.digest(shingles.get(i).getBytes(UTF_8))
      var b = 0
      while (b < SimHash.Bits) {
        votes(b) += (((digest(b >> 3) >> (7 - (b & 7))) & 1) << 1) - 1
        b += 1
      }
      i += 1
    }
    val halves = new Array[Any](SimHash.Halves)
    java.util.Arrays.fill(halves, 0L)
    var b = 0
    while (b < SimHash.Bits) {
      if (votes(b) >= 0) halves(b / 32) =
        halves(b / 32).asInstanceOf[Long] | (1L << (31 - b % 32))
      b += 1
    }
    new GenericArrayData(Array[Any](InternalRow.fromSeq(
      halves.toIndexedSeq.asInstanceOf[Seq[Any]])))
  }
}

/** The 9 MinHash signatures over a doc's token array —
  * `array(array<long>)` (singleton, or empty when too short) with the
  * same universal-hash family as [[Text.minhashSig]]: u1/u2 are the first
  * two big-endian 32-bit digest words, sig_i = min((u1*P1_i + u2*P2_i +
  * i) mod 2^31-1).
  */
case class MinHashShingles(child: Expression) extends ShingleKernel {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override protected def withNewChildInternal(c: Expression): MinHashShingles =
    copy(child = c)

  override def nullSafeEval(input: Any): Any = {
    val shingles = distinctShingles(input.asInstanceOf[ArrayData])
    if (shingles.isEmpty) return new GenericArrayData(Array.empty[Any])
    val md = ShingleSketches.md5()
    val k = Text.MinhashP1.length
    val sigs = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingles.size) {
      val d = md.digest(shingles.get(i).getBytes(UTF_8))
      val u1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val u2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var j = 0
      while (j < k) {
        val v = (u1 * Text.MinhashP1(j) + u2 * Text.MinhashP2(j) + j) %
          Text.MinhashMod
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(Array[Any](new GenericArrayData(sigs)))
  }
}

object ShingleSketches {
  private val tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  /** Thread-confined digest instance (`digest()` resets it per call). */
  private[functions] def md5(): MessageDigest = tl.get()

  /** Column API: singleton-array SimHash halves struct of a token-array
    * column; consume with `explode(...)`.
    */
  def simhash(toks: Column): Column =
    bridge.column(SimHashShingles(bridge.expression(toks)))

  /** Column API: singleton-array MinHash signature array of a token-array
    * column; consume with `explode(...)`.
    */
  def minhash(toks: Column): Column =
    bridge.column(MinHashShingles(bridge.expression(toks)))
}
