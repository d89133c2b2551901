package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra–Gries summary: at most k counters. The classic
  * guarantee: after processing n items, every item with true count
  * > n/(k+1) holds a counter, and each counter underestimates its true
  * count by at most n/(k+1).
  */
final class MisraGriesBuffer(val k: Int) {
  val counts = new java.util.HashMap[UTF8String, Long](k * 2)

  def add(item: UTF8String, by: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + by)
    else if (counts.size < k) counts.put(item.clone(), by) // clone: eval buffers are reused
    else decrementAll(by)
  }

  /** The k-full eviction step: subtract `by` from every counter, drop
    * non-positive ones. (When `by` comes from a single row it is 1 —
    * the textbook decrement.)
    */
  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  /** Mergeable-summaries merge (Agarwal et al. 2012): sum counters,
    * then if more than k remain, subtract the (k+1)-th largest count
    * from all and drop non-positives — the guarantee degrades
    * additively, staying within n/(k+1) for the COMBINED stream.
    */
  def mergeFrom(o: MisraGriesBuffer): Unit = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != 0L || counts.containsKey(e.getKey))
        counts.put(e.getKey, cur + e.getValue)
      else counts.put(e.getKey, e.getValue) // already private copies
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - m
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
    }
  }
}

/** Catalyst-native Misra–Gries heavy-hitters aggregate: per group, a
  * bounded summary of at most k (item, estimated count) counters. The
  * at-scale alternative to exact top-k-frequent (`ta_word_topk`'s full
  * groupBy): the map side keeps k counters per partition, the shuffle
  * carries k entries per partition instead of the full key space, and
  * the merge preserves the deterministic guarantee that every item
  * with frequency above n/(k+1) is present with error at most
  * n/(k+1) — the right primitive when the key space (urls, shingles,
  * n-grams) is itself 100 TB-scale.
  *
  * Determinism contract: when the DISTINCT key count of a group is at
  * most k, no decrement ever fires anywhere (map or merge), the
  * summary holds exact counts, and the result is order-independent —
  * the regime the oracle gate pins. Above k the guarantee (presence +
  * error bound) is deterministic but the exact counter values depend
  * on partitioning — asserted by property spec, not by hash oracle
  * (same split as the CMS error-bound verdict).
  *
  * Null contract: null items are skipped (they have no frequency).
  */
case class MisraGriesAgg(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(k >= 1, s"misra_gries: k=$k must be >= 1")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(k)

  override def update(b: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String], 1L)
    b
  }

  override def merge(b: MisraGriesBuffer, o: MisraGriesBuffer): MisraGriesBuffer = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: MisraGriesBuffer): Any = {
    // deterministic emission order (est desc, item asc) — cosmetic in
    // the exploded relational consumers, load-bearing for direct users
    val entries = new Array[(UTF8String, Long)](b.counts.size)
    var i = 0
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) => InternalRow(w, c) })
  }

  override def serialize(b: MisraGriesBuffer): Array[Byte] = {
    var bytes = 8
    val it = b.counts.keySet().iterator()
    while (it.hasNext) bytes += 12 + it.next().numBytes()
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(b.k).putInt(b.counts.size)
    val eit = b.counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val wb = e.getKey.getBytes
      bb.putInt(wb.length).put(wb).putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new MisraGriesBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val wb = new Array[Byte](len)
      bb.get(wb)
      b.counts.put(UTF8String.fromBytes(wb), bb.getLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(itemExpr = newChildren(0))
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  def apply(item: Column, k: Int): Column =
    ColumnBridge.column(new MisraGriesAgg(
      ColumnBridge.expression(item), k).toAggregateExpression())
}
