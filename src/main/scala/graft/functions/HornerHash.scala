package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codepoint Horner hash of a string — `fold(0, (acc, cp) =>
  * (acc * mult + cp) % mod)` over the string's Unicode codepoints, the
  * feature-bucket hash of the DSIR weights and the quality classifier.
  *
  * Exists because the same fold as a `functions.aggregate` HOF over
  * `sequence(1, length(s))` + `ascii(substr(s, j, 1))` is never
  * whole-stage-codegen'd (HigherOrderFunction), allocates a position
  * array per row, and re-substrings per element — an interpreted
  * O(len²) inner loop on what is a pure scan stage at 100 TB. This
  * expression is one codegen'd O(len) pass over the string.
  *
  * Bit-exact contract with both the HOF form and the DuckDB oracle's
  * `list_reduce(list_transform(range(...), ascii(substring(...))))`:
  * `ascii()` yields the codepoint of the first character (not the
  * byte), so the fold walks CODEPOINTS; mult/mod are small positive
  * literals, so `acc` stays far from Long overflow.
  */
object HornerHashHelper {
  def compute(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}

case class HornerHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  require(mult > 0 && mod > 1 && mod <= (Long.MaxValue / (mult + 0x110000)),
    s"horner_hash: mult=$mult mod=$mod would overflow the Long fold")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"horner_hash expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HornerHashHelper.compute(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HornerHashHelper.compute($s, ${mult}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HornerHash {
  def apply(s: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(
      new HornerHash(ColumnBridge.expression(s), mult, mod))
}
