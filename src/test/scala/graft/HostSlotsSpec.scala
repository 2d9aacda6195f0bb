package graft

import graft.operators.HostSlots
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The adaptive slot assigner: both physical forms must return the
  * same frame, and the skew probe must actually switch forms. */
class HostSlotsSpec extends SparkSpec {

  private def frontier(skewed: Boolean) = {
    val host =
      if (skewed) when(col("id") % 10 =!= 0L, lit(0L))
        .otherwise(col("id") / 10L)
      else col("id") / 10L
    spark.range(5000).select(col("id"), host.as("h")).repartition(8)
  }

  private def want(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("slot", row_number().over(
      Window.partitionBy(col("h")).orderBy(col("id"))).cast("bigint"))

  test("both branches equal the per-key window form") {
    for (skewed <- Seq(false, true)) {
      val df = frontier(skewed).cache()
      // force each branch via the threshold, independent of the probe
      val viaWindow = HostSlots.assign(df, "h", Seq(col("id")), "slot",
        skewThreshold = Long.MaxValue)
      val viaGrouped = HostSlots.assign(df, "h", Seq(col("id")), "slot",
        skewThreshold = 0L)
      val w = want(df)
      assert(viaWindow.except(w).isEmpty && w.except(viaWindow).isEmpty)
      assert(viaGrouped.except(w).isEmpty && w.except(viaGrouped).isEmpty)
      df.unpersist()
    }
  }

  test("the probe switches on the largest key's size") {
    // uniform: max key = 10 rows -> window form (a data-sized Window
    // node keyed on h); skewed at threshold 100 -> grouped form (the
    // only Window runs over the _go_pid segment frame)
    val uni = HostSlots.assign(frontier(skewed = false), "h",
      Seq(col("id")), "slot", skewThreshold = 100L)
    val uniPlan = uni.queryExecution.executedPlan.toString
    assert(uniPlan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("h#")), uniPlan)
    val sk = HostSlots.assign(frontier(skewed = true), "h",
      Seq(col("id")), "slot", skewThreshold = 100L)
    val skPlan = sk.queryExecution.executedPlan.toString
    val winLines = skPlan.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("_go_pid")),
      winLines.mkString("\n"))
  }

  test("empty input takes the window branch without a probe NPE") {
    val empty = frontier(skewed = false).filter(col("id") < 0)
    assert(HostSlots.assign(empty, "h", Seq(col("id")), "slot").count() == 0L)
  }
}
