package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set: `sig[k] = min over shingles of
  * xxh64(shingle, seed = k)` for k in 0 until numPerms, codegen'd as a
  * tight two-level loop over the UTF8 bytes (no per-(perm, shingle)
  * row explosion, no interpreted higher-order functions — the HOF
  * form was the second-hottest spot in the benchmark).
  *
  * The hash family only drives LSH candidate recall (candidates are
  * re-verified with exact Jaccard), so the exact function needs no
  * cross-engine parity — XXH64-with-seed-k is used directly.
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[Long](numPerms)
    var k = 0
    while (k < numPerms) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, k.toLong)
        if (h < m) m = h
        i += 1
      }
      sig(k) = m
      k += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numPerms];
         |for (int $k = 0; $k < $numPerms; $k++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $k);
         |    if ($h < $m) $m = $h;
         |  }
         |  $sig[$k] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(shingles: Column, numPerms: Int): Column =
    ColumnBridge.column(new MinHashSignature(
      ColumnBridge.expression(shingles), numPerms))
}
