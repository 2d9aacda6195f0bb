package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) operator: the maximal points of a
  * two-criteria preference (minimize `xCol`, maximize `yCol`) — "best
  * price for at least this capacity" style queries. A row is dominated
  * iff some other row is ≤ on x AND ≥ on y with at least one strict.
  *
  * Naive form is the O(n²) NOT-EXISTS self-join. This is the
  * distributive two-phase form:
  *  1. per-y minimum of x — a plain hash aggregate (map-side partials),
  *     shrinking n rows to |distinct y| candidates;
  *  2. a running strict-min sweep over the candidates ordered by y
  *     descending: candidate (min_x(y), y) is on the frontier iff
  *     min_x(y) < min over all larger y (ties on x lose to the larger
  *     y — equal x, strictly better y dominates).
  * The sweep's single-partition window is over |distinct y| rows only
  * (the aggregate already collapsed the data), so at 100 TB the big
  * input sees one shuffle-free partial aggregate + one tiny exchange —
  * never a self-join. Final step re-joins the frontier to recover every
  * row achieving a frontier point (co-located ties are all skyline
  * members: neither dominates the other); the join strategy is left to
  * the planner — the frontier is bounded by |distinct y|, which is
  * usually broadcast-size but NOT guaranteed, and with AQE the runtime
  * converts the join to broadcast whenever the frontier turns out
  * small, without risking a driver-side OOM on a high-cardinality y.
  * Rows with a null coordinate are excluded (null never joins back),
  * matching the SQL NOT-EXISTS form where null comparisons are UNKNOWN.
  */
object Skyline {

  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val reserved = Seq("_minx", "_best", "_fy").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input columns collide with Skyline temp names: ${reserved.mkString(",")}")
    val perY = df.groupBy(col(yCol)).agg(min(col(xCol)).as("_minx"))
    val sweep = Window.orderBy(col(yCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perY
      .withColumn("_best", min(col("_minx")).over(sweep))
      .filter(col("_best").isNull || col("_minx") < col("_best"))
      .select(col(yCol).as("_fy"), col("_minx"))
    df.join(frontier,
        df(yCol) === frontier("_fy") && df(xCol) === frontier("_minx"))
      .select(df.columns.map(df(_)).toIndexedSeq: _*)
  }
}
