package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate: bounded top-k of (sortDesc, tieAsc) pairs
  * per group — the partial-aggregating alternative to a row_number
  * window for top-n-per-key. A window sorts every row of a partition;
  * this buffer keeps at most k entries per group on the map side, so
  * the shuffle carries k rows per (group, partition) instead of all
  * rows — the difference between sorting 100 TB and merging k-lists.
  *
  * Buffer is a sorted Vector (k is small); merge is a bounded merge.
  * Comparison is (value desc, tie asc), both exact (decimal-safe
  * callers pass long-scaled values).
  *
  * Encoders are ExpressionEncoders (array-of-struct of longs), NOT
  * kryo: a kryo-encoded buffer is an opaque binary blob that breaks
  * whole-stage codegen around the aggregation and pays a
  * serialize/deserialize per row — with Tungsten-native encoding the
  * map-side top-k actually out-runs the window form it replaces.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Vector[(Long, Long)], Seq[(Long, Long)]] {

  private def insert(buf: Vector[(Long, Long)],
      v: (Long, Long)): Vector[(Long, Long)] = {
    // order: value desc, then tie asc
    val idx = buf.indexWhere(e => e._1 < v._1 || (e._1 == v._1 && e._2 > v._2))
    val w = if (idx < 0) buf :+ v else (buf.take(idx) :+ v) ++ buf.drop(idx)
    if (w.size > k) w.take(k) else w
  }

  override def zero: Vector[(Long, Long)] = Vector.empty

  override def reduce(buf: Vector[(Long, Long)],
      in: (Long, Long)): Vector[(Long, Long)] = insert(buf, in)

  override def merge(a: Vector[(Long, Long)],
      b: Vector[(Long, Long)]): Vector[(Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Vector[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Vector[(Long, Long)]] =
    ExpressionEncoder[Vector[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
