package graft

/** Plan-shape regression tests: the scale properties PLANS.md documents,
  * asserted so a refactor cannot silently regress them. Each query runs
  * at sf0.001 and its EXECUTED adaptive plan is inspected (collect first
  * — count() would build a different plan). */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    spark.catalog.clearCache()
    s
  }

  private def count(plan: String, pat: String): Int =
    pat.r.findAllIn(plan).length

  test("q01: ship-date predicate reaches the parquet scan") {
    val p = executedPlan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      count(p, "PushedFilters: \\[[^\\]]") >= 1, p.take(800))
  }

  test("q03: dims broadcast against the fact — no sort-merge join") {
    val p = executedPlan("q03_region_rollup")
    assert(count(p, "BroadcastHashJoin") >= 3, p.take(800))
    assert(count(p, "SortMergeJoin") == 0)
  }

  test("q38: per-group top-k has NO window sort (k-bounded aggregate)") {
    val p = executedPlan("q38_topk_per_group")
    assert(!p.contains("Window"), p.take(800))
    assert(p.contains("ObjectHashAggregate")) // TypedImperativeAggregate
  }

  test("q63: sketch quantile is a two-phase object aggregate, 2 exchanges") {
    val p = executedPlan("q63_hist_quantile")
    assert(count(p, "ObjectHashAggregate") == 2, p.take(800))
    assert(count(p, "Exchange") <= 2, p.take(800))
  }

  test("q62: as-of physical operator present; only the view-dedup window") {
    val p = executedPlan("q62_asof_physical")
    assert(p.contains("AsOfJoin"), p.take(1500))
    // exactly ONE window-function pass (the row_number view dedup;
    // WindowGroupLimit pre-filter nodes don't count) — the join itself
    // is the merge exec, not a window composition like q31
    assert(count(p, "Window \\[") <= 1, p.take(1500))
  }

  test("q50: optimizer rule rewrote the natural theta-join (no nested loop)") {
    val p = executedPlan("q50_range_join_rule")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q66: CMS shuffle carries sketches, map-side partial present") {
    val p = executedPlan("q66_cms_heavy_hitters")
    // two-phase: partial_cmsagg before the exchange, final after
    assert(count(p, "(?i)partial_cmsagg|cmsagg") >= 2, p.take(1200))
  }

  test("q169: transparent ANN rewrite planned the brute topK into the IVF probe") {
    val p = executedPlan("q169_ann_auto")
    // the probe scans the stored index with centroid partition pruning;
    // the brute-force shape (TakeOrderedAndProject over the base scan
    // with no partition filter) is gone
    assert(p.contains("PartitionFilters") &&
      p.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("centroid_id"), p.take(1500))
    assert(p.contains("graft-ann-auto") && p.contains("/ivf"), p.take(1500))
    graft.plans.AnnCatalog.clear()
  }

  test("q16: serving-date range predicate is pushed to the raw scan") {
    val p = executedPlan("q16_serve_events_by_date")
    assert(count(p, "PushedFilters: \\[[^\\]]") >= 1, p.take(800))
  }
}
