package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-level curation: the per-origin stage every web-scale corpus
  * runs between document filters and mixing (FineWeb / RefinedWeb cap
  * the number of documents any one domain may contribute; C4 blocklists
  * domains outright). The reference's corpus carries the same notion as
  * its per-source partitioning of scraped pages
  * (`extractor/service.py:58-116` — one crawl origin per endpoint).
  *
  * Everything here is grouped/windowed on the domain key only — at
  * 100 TB the domain grain is millions of rows (bounded by the web's
  * registrable-domain count, NOT corpus size), so domain-grain frames
  * are small; the per-document work stays distributed and one hot
  * domain is exactly the partition a `partitionBy(domain)` window
  * handles (skewed-domain caps are top-k-per-key: the window's
  * rank-limit pushes down to a per-partition top-k via
  * InferWindowGroupLimit — no full sort of the domain's documents).
  */
object Curation {

  /** Cap each domain's contribution at `maxPerDomain` documents,
    * keeping the best by `orderBy` (ties broken by `idCol` so the
    * selection replays bit-identically). Returns the surviving rows
    * with their `domain_rank`.
    *
    * One shuffle (the window's hash partitioning on the domain key);
    * `InferWindowGroupLimit` turns the rank filter into a per-partition
    * top-k so a skewed domain never materializes beyond the cap per
    * task. */
  def domainCap(df: DataFrame, domainCol: String, idCol: String,
                orderBy: Column, maxPerDomain: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(orderBy, col(idCol))
    df.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= maxPerDomain)
  }

  /** Domain-grain curation report: per-domain document count, kept
    * count under the cap, characters kept, and language spread —
    * the stats sheet a corpus audit publishes per origin.
    *
    * Two aggregates on the same domain key (the capped frame re-uses
    * the window's partitioning — no extra exchange). */
  def domainStats(df: DataFrame, domainCol: String, idCol: String,
                  charsCol: String, langCol: String,
                  orderBy: Column, maxPerDomain: Int): DataFrame = {
    val kept = domainCap(df, domainCol, idCol, orderBy, maxPerDomain)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(col(charsCol)).as("kept_chars"),
        countDistinct(col(langCol)).as("n_langs"))
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq(domainCol), "left")
  }

  /** Greedy quality-ranked selection under a global token budget — the
    * "fill a fixed training-token budget from the best documents" stage
    * (the selection mode DSIR/classifier scores ultimately feed).
    *
    * Exact semantics: order all rows by (`scoreCol` DESC, `idCol` ASC);
    * keep each row whose inclusive running `tokensCol` total is within
    * `budget` (tokens are non-negative, so the kept set is a prefix).
    *
    * Scalable shape: a global ordered cumsum is a single-partition
    * window — the corpus would serialize through one task. Instead the
    * score (expected in [0, 1]) is banded into `nBands` coarse buckets:
    *  1. per-band token totals (an `nBands`-row aggregate, map-side
    *     combined) locate the boundary band on the driver;
    *  2. every band strictly better than the boundary is kept wholesale
    *     by a map-side filter — its rows never shuffle;
    *  3. ONLY the boundary band pays the ordered cumsum — and not as a
    *     single-partition window: [[GlobalOrder.withRunningSumLong]]
    *     range-shuffles the band on the same (score DESC, id) order and
    *     carries per-partition totals, so even a DEGENERATE score
    *     distribution (e.g. quantized classifier scores putting most of
    *     the corpus on one value, hence in one band) never serializes
    *     through one task.
    * Banding is exact, not approximate: floor(score·nBands) is monotone
    * in score and equal scores land in the same band, so the banded
    * prefix is identical to the global one.
    *
    * Fails fast (IllegalArgumentException) if any score is NULL — an
    * unscored row has no place in a quality ordering, and silently
    * best- or worst-casing it would corrupt the selection. Callers
    * filter or impute first. */
  def selectByBudget(df: DataFrame, scoreCol: String, idCol: String,
                     tokensCol: String, budget: Long,
                     nBands: Int = 1000): DataFrame =
    selectByBudgets(df, scoreCol, idCol, tokensCol, Seq(budget), nBands).head

  /** [[selectByBudget]] at SEVERAL budgets over one input — the
    * ablation-curve shape (q276). The banded per-band token totals
    * depend only on the input, so they are computed and collected ONCE
    * and every budget's boundary is located on the driver from the same
    * array (r13: the per-budget form re-ran the nBands aggregate per
    * point — 4 identical corpus passes for a 4-point curve). Each
    * returned frame is exactly [[selectByBudget]]'s for that budget. */
  def selectByBudgets(df: DataFrame, scoreCol: String, idCol: String,
                      tokensCol: String, budgets: Seq[Long],
                      nBands: Int = 1000): Seq[DataFrame] = {
    // keep NULL scores as a NULL band (a bare `least` would silently
    // swallow the null and file the row under the best band)
    val banded = df.withColumn("_band",
      when(col(scoreCol).isNull, lit(null))
        .otherwise(least(floor(col(scoreCol) * nBands), lit(nBands - 1)))
        .cast("int"))
    val rawTotals = banded.groupBy(col("_band"))
      .agg(sum(col(tokensCol)).as("_bt"))
      .collect()                       // nBands-bounded, never corpus-sized
    require(!rawTotals.exists(_.isNullAt(0)),
      s"selectByBudget: NULL $scoreCol values present — score or filter " +
        "every row before budget selection")
    val bandTotals = rawTotals
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(-_._1)                   // best band first
    budgets.map { budget =>
      var acc = 0L; var boundary = Option.empty[Int]
      val it = bandTotals.iterator
      while (boundary.isEmpty && it.hasNext) {
        val (band, bt) = it.next()
        if (acc + bt > budget) boundary = Some(band) else acc += bt
      }
      boundary match {
        case None => banded.drop("_band") // the whole corpus fits
        case Some(b) =>
          val offset = acc
          val keepWhole = banded.filter(col("_band") > b).drop("_band")
          val boundaryKept = GlobalOrder.withRunningSumLong(
              banded.filter(col("_band") === b),
              Seq(col(scoreCol).desc, col(idCol)), col(tokensCol), "_cum")
            .filter(col("_cum") + offset <= budget)
            .drop("_band", "_cum")
          keepWhole.unionByName(boundaryKept)
      }
    }
  }

  /** Token-balanced contiguous shard assignment (webdataset-style
    * training-shard creation: consecutive documents in a deterministic
    * pseudo-random order fill shards of ≈`shardBudget` tokens each).
    *
    * Shard id is `exclusivePrefixSum(tokens) div shardBudget` over the
    * md5 rank order — an EXACT global prefix sum computed without a
    * global sort: the rank key's first two hex chars band the order into
    * 256 contiguous ranges (a string-prefix band respects the global
    * order by construction), per-band token totals collect to the driver
    * (256 rows — bounded, never corpus-sized), exclusive band offsets
    * broadcast back, and each band's internal cumsum is an ordinary
    * `partitionBy(band)` window. Two passes over the tokens column, no
    * single-partition window anywhere — the q208 banding idea
    * generalized from thresholding to packing. */
  def shardByTokens(df: DataFrame, idCol: String, tokensCol: String,
                    shardBudget: Long): DataFrame = {
    // localCheckpoint BEFORE the band-totals action: without it the
    // whole upstream plan (in q317/q319 the full decode+gate+PII chain)
    // evaluates twice — once for the collect below, once again when the
    // returned frame executes (guide §1/§5: cut lineage when an action
    // and the main plan share an expensive subtree). The checkpointed
    // frame is the DECISION-grain projection (id, tokens, rank — tens of
    // bytes per row, the guide-§8 lightweight proxy), never the payload.
    val ranked = df
      .withColumn("_rk",
        md5(concat_ws(":", lit("shard"), col(idCol).cast("string"))))
      .withColumn("_band", substring(col("_rk"), 1, 2))
      .localCheckpoint()
    val totals = ranked.groupBy(col("_band"))
      .agg(sum(col(tokensCol)).as("_bt"))
      .collect()                       // ≤256 rows — bounded
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, bt) =>
      val o = acc; acc += bt; (b, o)
    }
    val offDf = df.sparkSession.createDataFrame(offsets)
      .toDF("_band", "_off")
    val w = Window.partitionBy(col("_band"))
      .orderBy(col("_rk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive prefix via the Column API (interpolating the
    // caller-supplied tokensCol into an expr string would mis-resolve
    // names needing backquotes); only the internal names reach the one
    // expr, which exists for its integral `div`
    ranked.join(broadcast(offDf), "_band")
      .withColumn("_cum", sum(col(tokensCol)).over(w))
      .withColumn("_excl", col("_cum") - col(tokensCol) + col("_off"))
      .withColumn("shard", expr(s"_excl div ${shardBudget}L"))
      .drop("_rk", "_band", "_cum", "_off", "_excl")
  }
}
