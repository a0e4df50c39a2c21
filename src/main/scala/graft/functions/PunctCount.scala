package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native count of code points OUTSIDE `[a-zA-Z0-9 ]` — the value of
  * `length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))`
  * (t2's punctuation kernel, and the DuckDB oracle's formulation) without
  * the regex engine: a single pass over the UTF-8 bytes, counting lead
  * bytes whose code point is not ASCII-alnum-or-space. Multi-byte code
  * points count 1 each, exactly as the regex removes one code point per
  * match and both engines' `length` count code points. Measured 1.5 s →
  * byte-scan cost at sf1 (50k docs).
  */
case class PunctCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"punct_count expects string, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    PunctCount.count(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PunctCount.count($a);")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PunctCount {
  /** Called from both interpreted eval and generated code. */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        val in = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') || b == ' '
        if (!in) n += 1
        i += 1
      } else {
        // one code point per lead byte; continuation bytes are skipped
        n += 1
        i += (if (b >= 0xf0) 4 else if (b >= 0xe0) 3 else 2)
      }
    }
    n
  }

  def apply(text: Column): Column =
    bridge.column(PunctCount(bridge.expression(text)))
}
