package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable bounded top-k buffer over (value desc, tie asc) long pairs:
  * two flat arrays and an insertion sort, never more than k entries.
  */
final class TopKPairsBuffer(val k: Int) {
  val values = new Array[Long](k)
  val ties = new Array[Long](k)
  var size = 0

  def insert(v: Long, t: Long): Unit = {
    var i = 0
    while (i < size && (values(i) > v || (values(i) == v && ties(i) <= t))) i += 1
    if (i < k) {
      var j = math.min(size, k - 1)
      while (j > i) { values(j) = values(j - 1); ties(j) = ties(j - 1); j -= 1 }
      values(i) = v; ties(i) = t
      if (size < k) size += 1
    }
  }

  /** Append an entry KNOWN to sort after every current one (serialized
    * buffers are written in order) — O(1), vs insert()'s full scan.
    */
  def appendSorted(v: Long, t: Long): Unit =
    if (size < k) { values(size) = v; ties(size) = t; size += 1 }
}

/** Catalyst-native bounded top-k aggregate: per group, the k largest
  * (value, tie) pairs ordered (value desc, tie asc) — the
  * partial-aggregating alternative to a row_number window for
  * top-n-per-key. The window form sorts every row of every partition;
  * this buffer keeps at most k entries per group on the map side, so
  * the shuffle carries k pairs per (group, partition) instead of all
  * rows — at 100 TB that is the difference between sorting the fact
  * table and merging k-lists.
  *
  * Null contract: rows whose value or tie evaluates to NULL are
  * excluded from the ranking entirely (a bounded buffer has no place
  * for unordered elements). This differs from row_number over
  * `ORDER BY x DESC` — which ranks NULLs last — so callers wanting
  * SQL semantics over nullable inputs coalesce first; the engine's
  * own queries feed non-null key columns.
  *
  * A TypedImperativeAggregate (not a Dataset Aggregator): rows stay in
  * Tungsten format through ObjectHashAggregate, no per-row tuple
  * materialization, and the buffer ships between stages as 16k+4
  * bytes. Same operator family as Spark's own percentile/collect
  * aggregates.
  */
case class TopKPairsAgg(
    valueExpr: Expression,
    tieExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairsBuffer] {

  require(k >= 1, s"topk_pairs: k=$k must be >= 1")

  override def children: Seq[Expression] = Seq(valueExpr, tieExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType), StructField("tie", LongType))), containsNull = false)

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(b: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val v = valueExpr.eval(input)
    val t = tieExpr.eval(input)
    if (v != null && t != null)
      b.insert(v.asInstanceOf[Long], t.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsBuffer, o: TopKPairsBuffer): TopKPairsBuffer = {
    var i = 0
    while (i < o.size) { b.insert(o.values(i), o.ties(i)); i += 1 }
    b
  }

  override def eval(b: TopKPairsBuffer): Any =
    new GenericArrayData(
      (0 until b.size).map(i => InternalRow(b.values(i), b.ties(i))))

  override def serialize(b: TopKPairsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.size)
    bb.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.values(i)).putLong(b.ties(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKPairsBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // entries were serialized in sorted order: append directly (an
    // insert() here would scan past every prior entry — O(k²))
    while (i < n) { b.appendSorted(bb.getLong(), bb.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(valueExpr = newChildren(0), tieExpr = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

object TopKPairsAgg {
  def apply(value: Column, tie: Column, k: Int): Column =
    ColumnBridge.column(new TopKPairsAgg(
      ColumnBridge.expression(value), ColumnBridge.expression(tie), k)
      .toAggregateExpression())
}
