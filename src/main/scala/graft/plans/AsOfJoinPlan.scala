package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Descending, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.PlanBridge

/** Whole-operator as-of join through all three Catalyst extension layers:
  * a logical node ([[AsOfJoinNode]]), a planner strategy
  * ([[AsOfJoinStrategy]], injected by [[graft.GraftExtensions]]), and a
  * physical merge operator ([[AsOfJoinExec]]).
  *
  * The physical plan is the one a 100 TB point-in-time enrichment wants:
  * each side shuffled ONCE on its key and sorted (key, time) within
  * partitions — EnsureRequirements inserts exactly those exchanges/sorts
  * from the declared `requiredChildDistribution`/`Ordering` — then a
  * single streaming two-pointer merge per partition holding ONE buffered
  * right row, never a per-key window buffer over the unioned inputs (the
  * compositional form in [[AsOfJoin]]) and never a range-explosion.
  *
  * Semantics match DuckDB `ASOF JOIN` (inner): for each left row the
  * single right row with the greatest `rightTime <= leftTime` (backward)
  * or smallest `rightTime >= leftTime` (forward) within the same key;
  * right rows tied on (key, time) are broken deterministically by
  * keeping the last in the child's sort order.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def timeDir = if (forward) Descending else Ascending

  /** (key asc, time asc) for backward; (key asc, time desc) for forward —
    * either way "last right row seen at or before the left cursor" is the
    * as-of match, so ONE buffered row of state suffices. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val fwd = forward
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tAsc = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val tOrd: Ordering[InternalRow] = if (fwd) tAsc.reverse else tAsc
      val outProj = UnsafeProjection.create(output, leftOut ++ rightOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        // last right row consumed whose (key, time) is <= the cursor, in
        // the merge order; `matchKey` is its projected key (own copy —
        // projections reuse their output buffer)
        private var lastMatch: InternalRow = _
        private var matchKey: InternalRow = _
        private var pending: InternalRow = _

        private def advance(): Unit = {
          pending = null
          while (pending == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lT = lTimeProj(lRow).copy()
            var cont = true
            while (cont && rBuf.hasNext) {
              val rKey = rKeyProj(rBuf.head)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) {
                rBuf.next() // right key already passed — drop
              } else if (c == 0 && tOrd.compare(rTimeProj(rBuf.head), lT) <= 0) {
                matchKey = rKey.copy()
                lastMatch = rBuf.next().copy()
              } else {
                cont = false // right cursor is ahead of the left row
              }
            }
            if (lastMatch != null && matchKey != null &&
                keyOrd.compare(matchKey, lKey) == 0) {
              pending = outProj(joined(lRow, lastMatch))
              numOutputRows += 1
            } // inner semantics: unmatched left rows dropped
          }
        }

        override def hasNext: Boolean = {
          if (pending == null) advance()
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of iterator")
          val r = pending
          pending = null
          r
        }
      }
    }
  }
}

/** DataFrame-in / DataFrame-out builder over the custom operator. */
object AsOfJoinPhysical {

  /** As-of join `left` to `right` on `key`, matching per left row the
    * latest right row with `rightTime <= leftTime` (or earliest `>=`
    * when `direction = "forward"`). Requires [[AsOfJoinStrategy]] to be
    * injected (session extensions) or falls back to registering it on
    * the fly via `spark.experimental.extraStrategies`. */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val spark = SparkSession.active
    if (!spark.sessionState.planner.strategies.contains(AsOfJoinStrategy) &&
        !spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    }
    val lPlan = PlanBridge.analyzed(left)
    // fresh expr-ids on the right so a self-join can't alias attributes
    val rPlan = {
      val p = PlanBridge.analyzed(right)
      Project(p.output.map(a => Alias(a, a.name)()), p)
    }
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoinNode(lPlan, rPlan,
      Seq(attr(lPlan, key)), Seq(attr(rPlan, key)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      forward = direction == "forward")
    PlanBridge.dataFrame(spark, node)
  }
}
