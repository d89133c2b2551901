package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** AS-OF join as a first-class operator: LogicalPlan node → planner
  * Strategy → physical sort-merge exec. This is extension tier (c)
  * from SURVEY §7.3 — the full custom-operator path — implementing the
  * same semantics as the compositional form in Relational2.asofJoin
  * (for every left row, the most recent right row with equal key and
  * rightTime <= leftTime; unmatched left rows dropped), and verified
  * against DuckDB's native ASOF JOIN by sharing its oracle.
  *
  * Physical contract: both children hash-clustered on the key
  * (EnsureRequirements inserts the exchanges) and sorted within
  * partitions by (key, time); the exec then merges each partition pair
  * in one pass — the plan a native engine would run, with no
  * row-multiplying range join and state of exactly one buffered row.
  *
  * Keys and times are LongType expressions (callers cast; timestamps
  * as epoch micros), which keeps the merge loop primitive-typed.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val resolved: Boolean =
    childrenResolved && Seq(leftKey, rightKey, leftTime, rightTime)
      .forall(e => e.resolved && e.dataType == LongType)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val lSchema = left.output
    val rSchema = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKey, lTime), lSchema)
      val rKeyProj = UnsafeProjection.create(Seq(rKey, rTime), rSchema)
      val joined = new JoinedRow

      // One-row-lookahead over the right side. SQL join semantics for
      // nulls: a null key or time matches NOTHING, so null right rows
      // are skipped (they would otherwise read as 0 through the unsafe
      // projection and match genuine key-0 rows).
      var rRow: InternalRow = null
      var rK = 0L
      var rT = 0L
      def advanceRight(): Boolean = {
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
        rRow != null
      }
      advanceRight()

      // Most recent right row for the key currently being merged.
      var matchKey = Long.MinValue
      var matchRow: InternalRow = null

      lIter.flatMap { lRow =>
        val kt = lKeyProj(lRow)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          // null-keyed left rows match nothing
          Iterator.empty
        } else {
        val lK = kt.getLong(0)
        val lT = kt.getLong(1)
        if (lK != matchKey) { matchKey = lK; matchRow = null }
        // consume right rows up to (key, time) <= (lK, lT)
        while (rRow != null && (rK < lK || (rK == lK && rT <= lT))) {
          if (rK == lK) matchRow = rRow.copy() // buffered past iterator reuse
          advanceRight()
        }
        if (matchRow != null) Iterator.single(joined(lRow, matchRow))
        else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** Column-name API: asOf(left, right, "key", "key2", "t", "t2").
    * Registers the strategy on the session (idempotent) and lets the
    * analyzer resolve the attribute names.
    */
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    Strategies.register(spark, AsOfJoinStrategy)
    ColumnBridge.ofRows(spark, AsOfJoin(
      ColumnBridge.plan(left), ColumnBridge.plan(right),
      UnresolvedAttribute(leftKey), UnresolvedAttribute(rightKey),
      UnresolvedAttribute(leftTime), UnresolvedAttribute(rightTime)))
  }
}
