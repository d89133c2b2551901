package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
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
    Encoders.kryo[Vector[(Long, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]
}
