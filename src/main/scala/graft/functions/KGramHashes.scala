package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character k-gram Horner hashes of a string in ONE rolling pass:
  * element p (0-based) is `fold(0, (acc, cp) => (acc * b + cp) % m)`
  * over codepoints p..p+k-1 — the winnowing fingerprint's hash stream
  * (TextAnalysis.winnowFp).
  *
  * Exists for the same reason as [[HornerHash]]: the equivalent
  * explode(sequence) + aggregate-HOF form re-substrings k characters
  * per position through an interpreted lambda — O(n·k) uncodegen'd
  * work per document plus a position-array allocation. This expression
  * rolls each next hash out of the previous one (subtract the
  * outgoing codepoint's b^(k-1) term mod m, multiply, add the incoming
  * codepoint): O(n) codegen'd work, same values bit-for-bit.
  *
  * Overflow bounds: m < 2^31 keeps acc < 2^31; acc*b < 2^40 and
  * cp·b^(k-1) < 0x110000·m < 2^52 — all safely inside Long.
  */
object KGramHashesHelper {
  def compute(s: UTF8String, k: Int, b: Long, m: Long): ArrayData = {
    val str = s.toString
    // codepoint array (substring(text, j, 1) semantics = one char per
    // position, codepoint value — matches ascii() on both engines)
    val n = str.codePointCount(0, str.length)
    val cps = new Array[Int](n)
    var i = 0
    var p = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(p) = cp
      p += 1
      i += Character.charCount(cp)
    }
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // b^(k-1) mod m
    var bk1 = 1L
    var e = 0
    while (e < k - 1) { bk1 = (bk1 * b) % m; e += 1 }
    val out = new Array[Long](n - k + 1)
    var acc = 0L
    var j = 0
    while (j < k) { acc = (acc * b + cps(j)) % m; j += 1 }
    out(0) = acc
    var pos = 1
    while (pos <= n - k) {
      val t = (acc + m - (cps(pos - 1) * bk1) % m) % m
      acc = (t * b + cps(pos + k - 1)) % m
      out(pos) = acc
      pos += 1
    }
    new GenericArrayData(out)
  }
}

case class KGramHashes(child: Expression, k: Int, b: Long, m: Long)
    extends UnaryExpression {

  // b < 2^31 keeps t*b < 2^62 (t < m < 2^31) and cp·b^(k-1) < 2^52 —
  // inside Long; same guard style as HornerHash
  require(k >= 1 && b > 0 && b < Int.MaxValue && m > 1 && m < Int.MaxValue,
    s"kgram_hashes: k=$k b=$b m=$m out of the overflow-safe range")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    KGramHashesHelper.compute(input.asInstanceOf[UTF8String], k, b, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.KGramHashesHelper.compute($s, $k, ${b}L, ${m}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KGramHashes {
  def apply(s: Column, k: Int, b: Long, m: Long): Column =
    ColumnBridge.column(
      new KGramHashes(ColumnBridge.expression(s), k, b, m))
}
