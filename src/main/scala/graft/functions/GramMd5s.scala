package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional k-gram md5s of a document in one compiled pass — the
  * substring-dedup front end's gram enumeration. Replaces the
  * interpreted `transform(sequence(...), i -> md5(...))` chain: one
  * output element per window START (NON-distinct, position order —
  * `posexplode` downstream recovers the position), each the lowercase
  * md5 hex of the window's UTF-8 bytes, matching engine `md5()` on
  * both sides exactly.
  *
  * `words = true`: tokens are the `split(text, " ", -1)` words
  * (trailing empties kept — the Spark/DuckDB split convention) and a
  * window is k words joined by single spaces — byte-identical to
  * `md5(CAST(array_join(slice(ws, i, k), ' ') AS BINARY))`.
  * `words = false`: a window is k consecutive CODE POINTS, hashed as
  * their UTF-8 byte slice — engine-exact `md5(substring(s, i, k))`
  * semantics on any input (multilingual text, surrogate pairs, the
  * sentinel-coded BPE form including the U+E000.. band for ranks
  * past the control sentinels). INVALID UTF-8 frames exactly like
  * engine substring too (stride = Spark's own numBytesForFirstByte,
  * which counts stray continuation/0xF5.. lead bytes as one char) —
  * with ONE documented divergence: on a truncated multi-byte TAIL,
  * Spark's unsafe substring copies past the logical buffer (an
  * undefined adjacent byte), while this scan clamps the final window
  * to the real bytes (ExpressionsSpec pins both behaviors).
  *
  * Fewer than k tokens => empty array (no window fits).
  */
object GramMd5sHelper {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** One digest per thread, reset per window — compute() sits on the
    * compiled hot path and a per-row getInstance("MD5") allocation is
    * measurable at gram mass (5× row count on the BPE setting).
    */
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def hexOf(dig: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((dig(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(dig(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private def md5Hex(md: java.security.MessageDigest,
      s: String): UTF8String = {
    md.reset()
    hexOf(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  def compute(text: UTF8String, k: Int, words: Boolean): GenericArrayData = {
    val md = localMd.get()
    val s = text.toString
    if (words) {
      val ws = s.split(" ", -1)
      if (ws.length < k) return new GenericArrayData(Array.empty[Any])
      val n = ws.length - k + 1
      val out = new Array[Any](n)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < n) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        out(i) = md5Hex(md, sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // Char mode windows CODE POINTS over the raw UTF-8 byte stream —
      // both engines' substring/length are code-point based, so this
      // matches md5(substring(s, i, k)) on ANY input: multilingual
      // corpora, surrogate-pair emoji, and the U+E000.. BPE sentinel
      // band (ranks >= 32) all window correctly. (r18 shipped a loud
      // single-byte guard here; windowing the bytes by lead-byte scan
      // removes the input contract entirely and is byte-for-byte the
      // old behavior on ASCII/control input, where offsets are 1:1.)
      // One scan records each code point's byte offset; window i
      // hashes bytes [off(i), off(i+k)) — exactly the UTF-8 encoding
      // of those k code points, no String round-trip at all.
      // Stride via Spark's OWN numBytesForFirstByte so even INVALID
      // UTF-8 (stray continuation bytes, 0xF5.., truncated tails)
      // frames identically to engine substring/numChars — a
      // hand-rolled lead-byte table counted 0x80..0xC1 as 2-byte
      // leads where Spark counts them as 1, silently dropping grams
      // on malformed input.
      val bytes = text.getBytes
      val nb = bytes.length
      val offs = new Array[Int](text.numChars + 1)
      var cp = 0
      var b = 0
      while (b < nb) {
        offs(cp) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        cp += 1
      }
      // the final boundary is nb even when a truncated multi-byte
      // tail strode past it — engine substring stops at the buffer too
      offs(cp) = nb
      if (cp < k) return new GenericArrayData(Array.empty[Any])
      val n = cp - k + 1
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        md.reset()
        md.update(bytes, offs(i), offs(i + k) - offs(i))
        out(i) = hexOf(md.digest())
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

case class GramMd5s(child: Expression, k: Int, words: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"gram_md5s: k=$k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_md5s expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramMd5sHelper.compute(input.asInstanceOf[UTF8String], k, words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramMd5sHelper.compute($a, $k, $words);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramMd5s {
  def apply(text: Column, k: Int, words: Boolean): Column =
    ColumnBridge.column(new GramMd5s(ColumnBridge.expression(text), k, words))
}
