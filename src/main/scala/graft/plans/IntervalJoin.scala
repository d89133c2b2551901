package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Interval (range) join as a first-class operator — the second full
  * custom-operator build-out after [[AsOfJoin]]: emit every (left,
  * right) pair with equal keys and rightTime within [leftTime + lower,
  * leftTime + upper]. Same semantics as the bucketed-composition range
  * join in Relational3.rangeJoin, and verified against the same DuckDB
  * oracle.
  *
  * Physical contract: both children hash-clustered on the key
  * (EnsureRequirements inserts the exchanges) and sorted within
  * partitions by (key, time). The exec merges each partition pair with
  * a sliding window: because left times are ascending, the window's
  * bounds advance monotonically, so each right row enters and leaves
  * the buffer exactly once — O(|L| + |R| + matches) per partition,
  * with memory bounded by the widest window, never the partition. The
  * bucketed composition pays an explode×3 and a distinct; this exec
  * pays neither — it is what a native engine runs for interval joins.
  *
  * Keys and times are LongType expressions (callers cast; timestamps
  * as epoch micros), keeping the merge loop primitive-typed.
  */
case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    lower: Long,
    upper: Long) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val resolved: Boolean =
    childrenResolved && Seq(leftKey, rightKey, leftTime, rightTime)
      .forall(e => e.resolved && e.dataType == LongType)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    lower: Long,
    upper: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val (lKey, rKey, lTime, rTime) = (leftKey, rightKey, leftTime, rightTime)
    val (lSchema, rSchema) = (left.output, right.output)
    val (lo, hi) = (lower, upper)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKey, lTime), lSchema)
      val rKeyProj = UnsafeProjection.create(Seq(rKey, rTime), rSchema)
      val joined = new JoinedRow

      // SQL join semantics for nulls: a null key or time matches
      // NOTHING — null right rows are skipped rather than read as 0
      // through the unsafe projection (same contract as AsOfJoinExec).
      var rRow: InternalRow = null
      var rK = 0L
      var rT = 0L
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val cand = rIter.next()
          val kt = rKeyProj(cand)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rRow = cand
            rK = kt.getLong(0)
            rT = kt.getLong(1)
          }
        }
      }
      advanceRight()

      // sliding window of right rows for the key being merged:
      // parallel deques of times and buffered rows
      val bufT = new java.util.ArrayDeque[java.lang.Long]()
      val bufR = new java.util.ArrayDeque[InternalRow]()
      var bufKey = Long.MinValue
      var haveBufKey = false

      lIter.flatMap { lRow =>
        val kt = lKeyProj(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          Iterator.empty // null-keyed left rows match nothing
        } else {
        val lK = kt.getLong(0)
        val lT = kt.getLong(1)
        if (!haveBufKey || lK != bufKey) {
          bufT.clear(); bufR.clear(); bufKey = lK; haveBufKey = true
        }
        // drop right rows of earlier keys
        while (rRow != null && rK < lK) advanceRight()
        // admit right rows of this key with time <= lT + hi
        while (rRow != null && rK == lK && rT <= lT + hi) {
          bufT.addLast(rT); bufR.addLast(rRow.copy())
          advanceRight()
        }
        // evict rows below the (monotonically advancing) lower bound
        while (!bufT.isEmpty && bufT.peekFirst() < lT + lo) {
          bufT.removeFirst(); bufR.removeFirst()
        }
        // every buffered row is in [lT+lo, lT+hi] — emit all pairs
        val it = bufR.iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = joined(lRow, it.next())
        }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, lt, rt, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lo, hi) :: Nil
    case _ => Nil
  }
}

object IntervalJoin {
  /** Column-name API: join(left, right, "key", "key2", "t", "t2", lo,
    * hi). Registers the strategy on the session (idempotent) and lets
    * the analyzer resolve the attribute names.
    */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lower: Long, upper: Long): DataFrame = {
    Strategies.register(spark, IntervalJoinStrategy)
    ColumnBridge.ofRows(spark, IntervalJoin(
      ColumnBridge.plan(left), ColumnBridge.plan(right),
      UnresolvedAttribute(leftKey), UnresolvedAttribute(rightKey),
      UnresolvedAttribute(leftTime), UnresolvedAttribute(rightTime),
      lower, upper))
  }
}
