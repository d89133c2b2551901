package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Accumulator for the d-vector moment pass: row count, per-dimension
  * sums, and the d(d+1)/2 upper-triangle Gramian cells, every cell a
  * signed 128-bit integer holding an exact decimal(38,18) unscaled
  * value. Layout of `acc`: (hi, lo) pairs — first the d sums, then the
  * triangle cells row-major (i ≤ j).
  */
final class GramMomentsBuffer(val d: Int) {
  val nCells: Int = d * (d + 1) / 2
  var n: Long = 0L
  val acc = new Array[Long](2 * (d + nCells))
}

/** One-pass moment aggregate over an embedding column: n, Σxₖ (per
  * dimension), and the Gramian upper triangle Σxᵢxⱼ — the inputs of
  * `sim_gram_matrix` and `sim_covariance` — in a SINGLE
  * TypedImperativeAggregate, replacing the former per-row explode to
  * d(d+1)/2 = 2080 (i, j) rows.
  *
  * Why it exists (round-10 fix): the explode shape paid 2080× the scan
  * row count in materialized rows, and — the part the bench only
  * exposed on `sim_covariance` — each exploded product crossed
  * `cast(double as decimal(38,18))`, whose implementation goes through
  * `BigDecimal.valueOf` = `Double.toString` (~600 ns of digit
  * formatting per product; ~2.9 s of single-task CPU at sf0.1).
  * `sim_gram_matrix` looked 13× cheaper only because its bench
  * `.count()` let Catalyst prune the unreferenced decimal sum away;
  * the covariance sort key kept it alive. This aggregate does the same
  * arithmetic with zero fan-out and no string formatting.
  *
  * Exactness contract (same as the explode it replaces): a float×float
  * product promoted to double is EXACT (24-bit mantissas), each
  * product is quantized to scale 18 half-up — here computed from the
  * exact binary value with pure 128-bit integer arithmetic
  * (m·5¹⁸ ≫ shift; no allocation) — and accumulated in signed 128-bit
  * integers, so the sum is order-independent under any partitioning or
  * merge order. The quantization of one product can differ from the
  * Cast path's by 1 ulp at scale 18 (Cast rounds the SHORTEST decimal
  * rendering of the double, this rounds its exact binary expansion —
  * DuckDB's cast sides with the latter); both land on identical values
  * after the queries' final round-at-9, which the r10 harness verified
  * cell-by-cell against the explode implementation at sf0.01/sf0.1.
  *
  * 100 TB shape: the buffer is a constant 2·(d + d(d+1)/2) longs
  * (~68 KB at d=64) regardless of corpus size; map-side partials merge
  * by 128-bit adds; the shuffle moves one buffer per partition. Per
  * row the hot loop is d(d+1)/2 multiply+quantize+add — ~40× cheaper
  * than the explode's per-row hash-aggregate probes and decimal
  * string formatting, and embarrassingly parallel across scan
  * partitions.
  *
  * Range guard: the long-scaled quantization holds for |value| ≤ 9
  * (9·10¹⁸ < 2⁶³); component magnitudes beyond that fail loudly rather
  * than overflow silently. Unit-normalized embeddings (|x| ≤ 1, all
  * products ≤ 1) sit far inside the envelope.
  */
case class GramMomentsAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramMomentsBuffer] {

  require(d >= 1 && d <= 4096, s"gram_moments: d=$d out of range")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = GramMomentsAgg.schema

  override def createAggregationBuffer(): GramMomentsBuffer =
    new GramMomentsBuffer(d)

  override def update(b: GramMomentsBuffer, input: InternalRow): GramMomentsBuffer = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      require(arr.numElements() == d,
        s"gram_moments: embedding has ${arr.numElements()} components, expected $d")
      b.n += 1
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      i = 0
      while (i < d) {
        GramMomentsAgg.add128(b.acc, 2 * i, GramMomentsAgg.scale18(x(i)))
        i += 1
      }
      var c = 2 * d
      i = 0
      while (i < d) {
        val xi = x(i)
        var j = i
        while (j < d) {
          GramMomentsAgg.add128(b.acc, c, GramMomentsAgg.scale18(xi * x(j)))
          c += 2
          j += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: GramMomentsBuffer, o: GramMomentsBuffer): GramMomentsBuffer = {
    require(b.d == o.d, s"gram_moments: merging buffers of d=${b.d} and d=${o.d}")
    b.n += o.n
    var off = 0
    while (off < b.acc.length) {
      GramMomentsAgg.add128Pair(b.acc, off, o.acc(off), o.acc(off + 1))
      off += 2
    }
    b
  }

  override def eval(b: GramMomentsBuffer): Any = {
    val sums = new Array[Any](d)
    var i = 0
    while (i < d) {
      sums(i) = GramMomentsAgg.toDecimal(b.acc(2 * i), b.acc(2 * i + 1))
      i += 1
    }
    val cells = new Array[Any](b.nCells)
    var c = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val off = 2 * (d + c)
        cells(c) = InternalRow(i, j,
          GramMomentsAgg.toDecimal(b.acc(off), b.acc(off + 1)))
        c += 1
        j += 1
      }
      i += 1
    }
    InternalRow(b.n, new GenericArrayData(sums), new GenericArrayData(cells))
  }

  override def serialize(b: GramMomentsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 * b.acc.length)
    bb.putInt(b.d).putLong(b.n)
    var i = 0
    while (i < b.acc.length) { bb.putLong(b.acc(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramMomentsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new GramMomentsBuffer(bb.getInt())
    b.n = bb.getLong()
    var i = 0
    while (i < b.acc.length) { b.acc(i) = bb.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMomentsAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "gram_moments"
}

object GramMomentsAgg {
  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DecimalType(38, 18), containsNull = false),
      nullable = false),
    StructField("gram", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("v", DecimalType(38, 18), nullable = false))),
      containsNull = false), nullable = false)))

  private val POW5_18 = 3814697265625L // 5^18, 42 bits

  /** round-half-away-from-zero(p · 10¹⁸) as a Long, from the EXACT
    * binary value of p: p = ±m·2^e, so p·10¹⁸ = ±(m·5¹⁸)·2^(e+18);
    * the 95-bit product m·5¹⁸ lives in a (hi, lo) pair and the
    * negative exponent becomes a right shift with the half bit
    * deciding the round. No allocation, no Double.toString.
    */
  def scale18(p: Double): Long = {
    if (p == 0.0 || java.lang.Double.isNaN(p)) return 0L
    require(math.abs(p) <= 9.0,
      s"gram_moments: |value|=$p exceeds the long-scaled decimal(38,18) range")
    val bits = java.lang.Double.doubleToLongBits(p)
    val biased = ((bits >> 52) & 0x7FF).toInt
    var m = bits & 0x000FFFFFFFFFFFFFL
    var e = 0
    if (biased == 0) e = -1074 else { m |= 1L << 52; e = biased - 1075 }
    val hi = Math.multiplyHigh(m, POW5_18)
    val lo = m * POW5_18
    // |p| <= 9 forces e + 18 < 0 for any double with this magnitude
    val k = -(e + 18)
    val r =
      if (k >= 128) 0L
      else {
        val shifted =
          if (k >= 64) hi >>> (k - 64)
          else if (k == 0) lo
          else (lo >>> k) | (hi << (64 - k))
        val half =
          if (k == 0) 0L
          else if (k <= 64) (lo >>> (k - 1)) & 1L
          else (hi >>> (k - 65)) & 1L
        shifted + half
      }
    if (p < 0) -r else r
  }

  /** acc(off, off+1) += v, where acc holds a signed 128-bit (hi, lo)
    * and v sign-extends to 128 bits.
    */
  def add128(acc: Array[Long], off: Int, v: Long): Unit =
    add128Pair(acc, off, v >> 63, v)

  /** acc(off, off+1) += (oHi, oLo) in signed 128-bit arithmetic. */
  def add128Pair(acc: Array[Long], off: Int, oHi: Long, oLo: Long): Unit = {
    val aLo = acc(off + 1)
    val lo = aLo + oLo
    val carry = ((aLo & oLo) | ((aLo | oLo) & ~lo)) >>> 63
    acc(off) += oHi + carry
    acc(off + 1) = lo
  }

  /** (hi, lo) unscaled scale-18 integer → Decimal(38, 18). */
  def toDecimal(hi: Long, lo: Long): org.apache.spark.sql.types.Decimal = {
    val loBytes = java.nio.ByteBuffer.allocate(8).putLong(lo).array()
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(1, loBytes))
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(bi, 18), 38, 18)
  }

  def apply(embedding: Column, d: Int): Column =
    ColumnBridge.column(new GramMomentsAgg(
      ColumnBridge.expression(embedding), d).toAggregateExpression())
}
