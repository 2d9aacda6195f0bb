package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Runtime probe-or-brute choice for a FILTERED ANN top-k.
  *
  * [[AnnIndexRule]] rewrites `WHERE pred ORDER BY cosine LIMIT k` into an
  * over-fetched index probe (k' = k × expansion candidates) joined back
  * to the base table with the predicate re-applied — the standard
  * post-filter ANN contract (pgvector's filtered `ORDER BY embedding <=>
  * q LIMIT k` behaves the same way, reference
  * cache_manager/service.py:43-58 always carries a date predicate). That
  * contract is exact only when at least k of the k' candidates survive
  * the predicate; whether they do is a RUNTIME fact, so the plan carries
  * both alternatives and this operator picks at execution:
  *
  *  - run the probe branch (≤ k rows after its own sort+limit; one
  *    driver collect of k rows, bounded);
  *  - if it produced k rows, those ARE the answer — emit them;
  *  - otherwise run the always-correct brute branch (scan + score +
  *    top-k) and emit that.
  *
  * The brute branch is deliberately exchange-free (Limit+Sort plans as
  * TakeOrderedAndProject), so under AQE no query stage below it
  * materializes unless the fallback actually fires — the fallback costs
  * nothing on the happy path. Selective predicates therefore get index
  * speed with exact results, and over-selective ones degrade to exactly
  * the plan they would have had without an index.
  */
case class AnnFallbackNode(probe: LogicalPlan, brute: LogicalPlan, k: Int)
    extends BinaryNode {
  override def left: LogicalPlan = probe
  override def right: LogicalPlan = brute
  override def output: Seq[Attribute] = probe.output
  override def maxRows: Option[Long] = Some(k.toLong)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AnnFallbackNode =
    copy(probe = newLeft, brute = newRight)
}

object AnnFallbackStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AnnFallbackNode(p, b, k) =>
      AnnFallbackExec(k, planLater(p), planLater(b)) :: Nil
    case _ => Nil
  }
}

case class AnnFallbackExec(k: Int, probe: SparkPlan, brute: SparkPlan)
    extends BinaryExecNode {
  override def left: SparkPlan = probe
  override def right: SparkPlan = brute
  override def output: Seq[Attribute] = probe.output

  override lazy val metrics = Map(
    "probeRows" -> SQLMetrics.createMetric(sparkContext,
      "rows returned by the filtered index probe"),
    "fallbackFired" -> SQLMetrics.createMetric(sparkContext,
      "1 when the brute-force branch ran"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AnnFallbackExec =
    copy(probe = newLeft, brute = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // both branches end in their own sort+limit, so the collect is
    // bounded by k rows — driver state O(k), never data-proportional
    val rows = probe.executeCollect()
    longMetric("probeRows") += rows.length
    if (rows.length >= k) {
      // k candidates survived the predicate: by the over-fetch argument
      // (any row outside the k' candidates scores below all of them)
      // these are the top-k; emit in the probe's sorted order
      sparkContext.parallelize(rows.toIndexedSeq, 1)
    } else {
      // fewer than k survived — the true top-k may include rows the
      // probe never saw; degrade to the always-correct scan
      longMetric("fallbackFired") += 1
      brute.execute()
    }
  }
}
