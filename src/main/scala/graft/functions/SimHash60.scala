package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a distinct-token array in one pass — replaces the
  * (token x 60 bits) explode + md5-per-row pipeline (10M+ interpreted
  * rows at sf0.1) with one md5 per token.
  *
  * Bit-exact contract with the DuckDB oracle (see Dedup.simhashCte):
  * per token, the 60-bit hash is hex chars 2..16 of `md5(token)`; bit
  * b = bit (3 - b%4) of hex digit b/4; each bit accumulates +1 if
  * set, -1 if clear over all tokens; the simhash sets bit (59-b) when
  * the sum is strictly positive.
  */
object SimHash60Helper {
  // one digest per thread (same pattern as CountMinAgg): md.digest()
  // resets the instance itself, so no per-token reset is needed either
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Null on a null array element (SQL null propagation — the SQL
    * surface admits containsNull arrays); a boxed Long so the codegen
    * path can branch on it.
    */
  def compute(arr: ArrayData): java.lang.Long = {
    val md = md5.get()
    val counts = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val digest = md.digest(arr.getUTF8String(i).getBytes)
      // hex chars 2..16 = low nibble of byte 0, then bytes 1..7
      var b = 0
      while (b < 60) {
        val hexIdx = 1 + b / 4 // hex char position (0-based) in the digest hex
        val byteIdx = hexIdx / 2
        val nibble =
          if (hexIdx % 2 == 0) (digest(byteIdx) >> 4) & 0xf
          else digest(byteIdx) & 0xf
        val bit = (nibble >> (3 - b % 4)) & 1
        counts(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) sim |= 1L << (59 - b)
      b += 1
    }
    sim
  }
}

case class SimHash60(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash60Helper.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("sim")
      s"""
         |java.lang.Long $tmp = graft.functions.SimHash60Helper.compute($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(new SimHash60(ColumnBridge.expression(tokens)))
}
