package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Flat depth×width cell array; merge is cell-wise addition, so the
  * sketch is a commutative monoid — partition order can never show in
  * the result.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val cells = new Array[Long](depth * width)
}

/** Catalyst-native count-min sketch: one pass over the rows, updating
  * `depth` cells per row in a fixed depth×width long array that merges
  * by addition — the mergeable fixed-size frequency summary a
  * distributed or streaming counter actually keeps. Compared to the
  * explode-by-depth + groupBy composition, no row is ever multiplied
  * and the shuffle carries one (depth×width×8)-byte buffer per
  * partition instead of depth rows per input row.
  *
  * Cell arithmetic is the engine's cross-engine md5 contract (see
  * graft.corpus.CorpusPipeline.hashBucket): row j of the sketch
  * buckets key k by the first 6 hex digits of md5("cms" + j + ":" +
  * k) mod width, so a DuckDB oracle reproduces every cell exactly.
  * NULL keys are skipped (they are not a countable identity).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsBuffer] {

  require(depth >= 1 && width >= 1,
    s"count_min: depth=$depth width=$width must both be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min expects a bigint key, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(b: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val md = CountMinAgg.digest.get()
      var j = 0
      while (j < depth) {
        md.reset()
        md.update(s"cms$j:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = md.digest()
        val bucket = (((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) |
          (h(2) & 0xff)) % width
        b.cells(j * width + bucket) += 1
        j += 1
      }
    }
    b
  }

  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
    var i = 0
    while (i < b.cells.length) { b.cells(i) += o.cells(i); i += 1 }
    b
  }

  override def eval(b: CmsBuffer): Any = new GenericArrayData(b.cells)

  override def serialize(b: CmsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * b.cells.length)
    bb.putInt(b.depth).putInt(b.width)
    var i = 0
    while (i < b.cells.length) { bb.putLong(b.cells(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new CmsBuffer(bb.getInt(), bb.getInt())
    var i = 0
    while (i < b.cells.length) { b.cells(i) = bb.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "count_min"
}

object CountMinAgg {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(key: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(new CountMinAgg(
      ColumnBridge.expression(key), depth, width).toAggregateExpression())
}
