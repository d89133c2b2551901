package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a single-space-separated document in
  * one pass: split + window-join + first-occurrence dedup, replacing
  * the interpreted `transform(sequence)/element_at/array_distinct`
  * chain that dominated the dedup benchmarks. Semantics match that
  * chain (and DuckDB's `list_distinct(list_transform(range...))`)
  * exactly for set-oriented consumers: same elements, first-occurrence
  * order.
  */
object WordShinglesHelper {
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    // limit -1 keeps trailing empty tokens — the exact convention of
    // Spark's split(col, " ") and DuckDB's string_split (Scala's
    // split(Char) would silently drop them, diverging from the chain
    // this expression replaces on trailing-separator documents)
    val words = text.toString.split(" ", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((words.length - k + 1) * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= words.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"word_shingles: k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShinglesHelper.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShinglesHelper.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(new WordShingles(ColumnBridge.expression(text), k))
}
