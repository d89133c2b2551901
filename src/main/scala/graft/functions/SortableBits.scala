package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving double <-> long bit codec: `sortable(a) < sortable(b)`
  * iff `a < b` (IEEE-754 total order), and the round trip is
  * bit-exact. Lets long-keyed bounded aggregates
  * ([[graft.operators.TopKPairsAgg]]) rank double scores without any
  * loss: encode on the way in, decode the survivors on the way out.
  *
  * Encoding: IEEE-754 bits already order non-negative doubles
  * correctly under SIGNED long comparison; negative doubles keep
  * their sign bit and flip the 63 magnitude bits (more negative
  * double -> more negative long). The transform is an involution, so
  * encode and decode share one formula. Caveat inherited from total
  * order: -0.0 encodes below +0.0 (doubles compare them equal);
  * callers ranking scores where an exact ±0.0 tie matters should
  * normalize zeros first.
  */
object SortableBitsHelper {
  def toSortable(x: Double): Long = {
    val b = java.lang.Double.doubleToRawLongBits(x)
    b ^ ((b >> 63) & Long.MaxValue)
  }
  def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
}

/** double -> order-preserving long (see [[SortableBitsHelper]]). */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"double_sortable_bits expects double, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SortableBitsHelper.toSortable(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SortableBitsHelper.toSortable($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "double_sortable_bits"
}

object DoubleSortableBits {
  def apply(c: Column): Column =
    ColumnBridge.column(new DoubleSortableBits(ColumnBridge.expression(c)))
}

/** Inverse of [[DoubleSortableBits]]: sortable long -> the original double. */
case class SortableBitsToDouble(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sortable_bits_to_double expects bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    SortableBitsHelper.fromSortable(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SortableBitsHelper.fromSortable($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sortable_bits_to_double"
}

object SortableBitsToDouble {
  def apply(c: Column): Column =
    ColumnBridge.column(new SortableBitsToDouble(ColumnBridge.expression(c)))
}
