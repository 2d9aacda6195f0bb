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

  test("q16 layout A/B: date-partitioned serving read prunes to ONE partition") {
    // the AB_r11 `serve_date_layout` pair's B side, shape-asserted:
    // with events at rest partitioned by event_date, the day filter
    // becomes a PLANNING-time partition filter — the scan touches one
    // directory of thirty, which at 100 TB is a day instead of years
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-q16-layout").toString
    graft.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date")
      .parquet(s"$tmp/bydate")
    val day = "2024-01-05"
    val df = graft.serve.Serving.eventsByDate(
      spark.read.parquet(s"$tmp/bydate")
        .filter(col("event_date") === to_date(lit(day)))
        .drop("event_date"),
      date = day, today = "2024-01-01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val pf = p.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
    assert(pf.contains("event_date"), p.take(1200))
    // the scan reads exactly the one matching partition (sparkPlan:
    // AQE wraps leaves in query stages, but partition listing is a
    // planning-time property, identical in the pre-adaptive plan)
    val scanned = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.nonEmpty && scanned.forall(_ == 1), scanned.toString)
    // and the pruned result matches the shipped q16 on the same day
    val shipped = SparkEntry.queries("q16_serve_events_by_date")(spark, sf)
      .collect()
    assert(rows.map(_.toString).toSeq == shipped.map(_.toString).toSeq)
  }

  test("q216: blocklist pass is scan-rate — no join, no window, no data sort") {
    val p = executedPlan("q216_blocklist_filter")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(1200))
    // shuffles: the bounded source-grain aggregate + the presentation
    // sort only — nothing corpus-grain repartitions
    assert(count(p, "Exchange hashpartitioning") <= 1, p.take(1200))
  }

  test("q212: percentile threshold never sorts the corpus") {
    val p = executedPlan("q212_percentile_threshold")
    // the only window runs over the bounded histogram's bin key; the
    // corpus is never range-shuffled on its own key (the one
    // rangepartitioning is the presentation sort of the 1-row output,
    // keyed on the derived threshold)
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("bin")), windowLines.mkString("\n"))
    assert(count(p, "Exchange rangepartitioning\\(n_chars") == 0, p.take(1500))
  }

  test("q218: shard packing has no single-partition data window") {
    val p = executedPlan("q218_token_shards")
    // every window partitions by the 256-value band key; nothing runs
    // over an unpartitioned corpus frame
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty &&
      windowLines.forall(_.contains("_band")), windowLines.mkString("\n"))
    assert(count(p, "Exchange SinglePartition.*Window") == 0)
  }

  test("q208: budget selection's boundary cumsum rides GlobalOrder, not a window") {
    val p = executedPlan("q208_token_budget")
    // GlobalOrder materializes the range-sorted band (ExistingRDD scan);
    // any Window left runs over the bounded _go_pid offsets frame
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("_go_pid")), windowLines.mkString("\n"))
  }

  test("q222/q223: media decode is one projection — no join, no window, no agg") {
    Seq("q222_audio_stats", "q223_video_stats").foreach { q =>
      val p = executedPlan(q)
      assert(!p.contains("Join") && !p.contains("Window") &&
        !p.contains("HashAggregate"), s"$q:\n${p.take(1200)}")
      // the only exchange is the presentation sort's range partitioning
      assert(count(p, "Exchange hashpartitioning") == 0, s"$q:\n${p.take(1200)}")
    }
  }

  test("crawl projections (q290/q292/q294/q296/q299/q302): no join, no shuffle before the sort") {
    Seq("q290_unicode_normalize", "q292_blocklist_scan",
        "q294_robots_gate", "q296_boilerplate_extract",
        "q299_charset_decode", "q302_decode_chain").foreach { q =>
      val p = executedPlan(q)
      assert(!p.contains("Join") && !p.contains("Window"),
        s"$q:\n${p.take(1200)}")
      // pure per-row work: the only exchange is the presentation
      // sort's range partitioning
      assert(count(p, "Exchange hashpartitioning") == 0,
        s"$q:\n${p.take(1200)}")
    }
  }

  test("q288/q291/q300: one hash shuffle each (the dedup groupBy), no join") {
    Seq("q288_url_canonical_dedup", "q291_registered_domain",
        "q300_entity_dedup").foreach { q =>
      val p = executedPlan(q)
      assert(!p.contains("Join"), s"$q:\n${p.take(1200)}")
      // partial_count map-side + ONE exchange on the canonical key
      assert(count(p, "Exchange hashpartitioning") <= 2,
        s"$q:\n${p.take(1200)}")
      assert(p.contains("partial_count") || p.contains("partial_min"),
        s"$q:\n${p.take(1200)}")
    }
  }

  test("q304: redirect resolution is bounded joins — no cartesian, no window, no driver loop") {
    val p = executedPlan("q304_redirect_resolve")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("Window"),
      p.take(1200))
    // pointer doubling at maxHops=4 = 1 self-join + the out-edge probe
    // + the left join back to docs: all equi-joins on 8-byte keys
    assert(count(p, "Join") >= 3, p.take(1200))
  }

  test("q309: composed frontier planner — no cartesian, no data-sized window, no data sort") {
    val p = executedPlan("q309_frontier_planner")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    // the only windows allowed are PARTITIONED ones: the per-host slot
    // rank (keyed on host_id when the probe picks the window form) or
    // GlobalOrder's segment-frame prefix (keyed on _go_pid) — never an
    // empty partitionBy over the data
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(l =>
      l.contains("host_id#") || l.contains("_go_pid")),
      winLines.mkString("\n"))
    // the only GLOBAL sort is the per-host-report presentation ORDER
    // BY (host grain, 7 rows at this sf) — no stage sorts the frontier
    // globally; the slot rank's sorts are partition-local (", false")
    val globalSorts = p.linesIterator
      .filter(l => l.contains("Sort [") && l.contains("], true")).toSeq
    assert(globalSorts.nonEmpty && globalSorts.forall(_.contains("host_id#")),
      globalSorts.mkString("\n"))
  }

  test("q317: curation pipeline — windows only on bounded grains, no cartesian, no data sort") {
    val p = executedPlan("q317_training_shards")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    // the only windows are the dedup keep-first rank (keyed on the
    // content hash — group size = dup count) and shardByTokens' 256-band
    // prefix sum (keyed on _band) — never an empty partitionBy
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty && winLines.forall(l =>
      l.contains("_h#") || l.contains("_band#")),
      winLines.mkString("\n"))
    // the only GLOBAL sort is the presentation ORDER BY shard (shard
    // grain — bounded by corpus_tokens/budget); gate joins, dedup and
    // packing never sort the corpus globally
    val globalSorts = p.linesIterator
      .filter(l => l.contains("Sort [") && l.contains("], true")).toSeq
    assert(globalSorts.forall(_.contains("shard#")),
      globalSorts.mkString("\n"))
  }

  test("q319: web→shards — the wire+decode+curation pass stays per-row up to the dedup hash") {
    val p = executedPlan("q319_web_to_shards")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty && winLines.forall(l =>
      l.contains("_h#") || l.contains("_band#")),
      winLines.mkString("\n"))
    val globalSorts = p.linesIterator
      .filter(l => l.contains("Sort [") && l.contains("], true")).toSeq
    assert(globalSorts.forall(_.contains("shard#")),
      globalSorts.mkString("\n"))
  }

  test("q293: chunk dedup shuffles HASHES — chunk text never reaches an exchange") {
    val p = executedPlan("q293_cdc_chunk_dedup")
    // every hash exchange keys on the md5 (h) or doc_id — never the
    // chunk string itself
    val exLines = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exLines.nonEmpty, p.take(1200))
    assert(exLines.forall(l => !l.contains("chunk#")),
      exLines.mkString("\n"))
  }

  test("q321/q328: archive index build and WET derivation are scan-shaped " +
    "— no join, no window, no shuffle before the presentation sort") {
    Seq("q321_cdx_index", "q328_wet_derivation").foreach { q =>
      val p = executedPlan(q)
      assert(!p.contains("Join") && !p.contains("Window"), s"$q:\n" +
        p.take(1200))
      // the ONLY exchanges are the fixed repartition of the corpus
      // read (tSpread), the bounded shard groupBy (q328), and the
      // presentation sort's range exchange — never a hash exchange on
      // a data-grain string key
      val exLines = p.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(exLines.forall(l => !l.contains("urlkey#") &&
        !l.contains("uri#")), s"$q:\n" + exLines.mkString("\n"))
    }
  }

  test("q323/q327: epoch diff joins at INDEX grain — one SMJ on urlkey, " +
    "no cartesian, digests never broadcast") {
    Seq("q323_crawl_delta", "q327_archive_refresh").foreach { q =>
      val p = executedPlan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q:\n" + p.take(1200))
      // the full-outer epoch join MUST be a sort-merge join — neither
      // side of an archive diff is broadcastable by definition
      assert(count(p, "SortMergeJoin") == 1, s"$q:\n" + p.take(1500))
      assert(!p.contains("BroadcastHashJoin"), s"$q:\n" + p.take(1500))
    }
  }
}
