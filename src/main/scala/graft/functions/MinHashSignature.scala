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

/** MinHash signature of a shingle set: each shingle is hashed ONCE
  * with xxh64, and the k-th permutation is the affine map
  * `a_k * h + b_k` (odd multipliers, standard universal-hash MinHash),
  * so signing costs one byte-hash plus numPerms multiply-adds per
  * shingle instead of numPerms byte-hashes — ~10x less hashing work
  * than the hash-per-permutation form at 128 perms.
  *
  * The hash family only drives LSH candidate recall (candidates are
  * re-verified with exact Jaccard), so the exact family needs no
  * cross-engine parity; the affine family's collision statistics match
  * the per-seed family's for the banding analysis in
  * [[graft.queries.Dedup]].
  */
object MinHashSignatureHelper {
  private val coeffCache =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Long], Array[Long])]

  /** Deterministic pseudo-random coefficients per permutation count:
    * a_k odd (a bijection of Z/2^64), b_k arbitrary.
    */
  def coeffs(numPerms: Int): (Array[Long], Array[Long]) =
    coeffCache.getOrElseUpdate(numPerms, {
      val as = Array.tabulate(numPerms)(k =>
        XXH64.hashLong(k.toLong, 0x243F6A8885A308D3L) | 1L)
      val bs = Array.tabulate(numPerms)(k =>
        XXH64.hashLong(k.toLong, 0x13198A2E03707344L))
      (as, bs)
    })

  def compute(arr: ArrayData, numPerms: Int): GenericArrayData = {
    val (as, bs) = coeffs(numPerms)
    val n = arr.numElements()
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      // null element -> null signature (SQL null propagation), not an
      // executor NPE; internal callers produce containsNull=false
      if (arr.isNullAt(i)) return null
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 0L)
      var k = 0
      while (k < numPerms) {
        val v = as(k) * h + bs(k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression {

  require(numPerms >= 1, s"minhash_signature: numPerms=$numPerms must be >= 1")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureHelper.compute(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSignatureHelper.compute($a, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(shingles: Column, numPerms: Int): Column =
    ColumnBridge.column(new MinHashSignature(
      ColumnBridge.expression(shingles), numPerms))
}
