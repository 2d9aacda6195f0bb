package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-shape data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw
  * document by the average log importance ratio of its unigrams
  * between a TARGET distribution (the high-quality / in-domain sample
  * you want more of) and the RAW corpus distribution, then keep the
  * documents the target model prefers. The reference has no corpus
  * assembly at all, so like MixtureSample this extends the
  * training-data surface rather than porting a reference operator.
  *
  * Hashed-ngram DSIR reduces to exactly this with the hash dropped —
  * plain unigrams keep the computation ANSI-SQL-replayable for the
  * oracle while the plan shape (the thing that matters at 100 TB) is
  * identical: one token explode per side, two vocabulary-grain count
  * aggregates, a vocabulary-sized ratio table joined back to the token
  * stream (shuffle on the word key — never broadcast: vocabulary grows
  * Heaps-law-unboundedly with corpus content, the q88 lesson), and one
  * per-document average. Laplace (+1) smoothing handles raw-only words;
  * the scalar totals ride a broadcast 1-row cross join.
  *
  * Determinism: `ln` of a ratio of exact integers, summed per doc and
  * quantized at 4 decimals by the floor(x·10⁴+0.5) idiom — the same
  * contract q88's bigram perplexity has held across engines at every
  * scale factor.
  */
object ImportanceSelect {

  /** The vocabulary-grain log importance-ratio frame — DSIR's trainable
    * artifact, computed ONCE offline over (raw, target): (_w, _lr).
    * This is the streaming split of [[dsirWeights]]: a daily pipeline
    * freezes this frame (cache or write it) and serves arriving
    * micro-batches through [[scoreWith]], never re-scanning the
    * historical corpus per batch. Vocabulary-sized (Heaps-law-unbounded
    * — join it by shuffle, never broadcast). */
  def dsirRatio(raw: DataFrame, target: DataFrame,
                textCol: String): DataFrame = {
    import graft.text.TextFunctions.unigrams
    val rawTok = unigrams(raw, textCol)
    val targetTok = unigrams(target, textCol)
    val cR = rawTok.groupBy(col("_w")).agg(count(lit(1)).as("_cr"))
    val cT = targetTok.groupBy(col("_w")).agg(count(lit(1)).as("_ct"))
    // scalar totals: raw token mass, vocabulary size, target token mass
    val totR = cR.agg(sum(col("_cr")).as("_nr"), count(lit(1)).as("_v"))
    val totT = targetTok.agg(count(lit(1)).as("_nt"))
    cR.join(cT, Seq("_w"), "left")
      .na.fill(0L, Seq("_ct"))
      .crossJoin(broadcast(totR)).crossJoin(broadcast(totT))
      .select(col("_w"),
        (log((col("_ct") + 1) / (col("_nt") + col("_v"))) -
          log((col("_cr") + 1) / (col("_nr") + col("_v")))).as("_lr"))
  }

  /** [[dsirRatio]] when the target is a SUBSET of `raw` selected by a
    * boolean column (the common "in-domain = lang, source or label
    * flag" case): ONE tokenization pass feeds both count frames via a
    * conditional aggregate instead of two full unigram scans.
    * `_cr`/`_ct` are the same longs the two-scan form produces (a
    * token of a target row counts in both; a raw word absent from the
    * target gets `_ct = 0`, exactly the old left-join fill), `_v` and
    * the token masses are sums over the same multiset — the `_lr`
    * doubles are bit-identical. */
  def dsirRatioSplit(raw: DataFrame, isTarget: Column,
                     textCol: String): DataFrame = {
    import graft.text.TextFunctions.unigrams
    val counts = unigrams(raw, textCol, isTarget.as("_tgt"))
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("_cr"),
        count(when(col("_tgt"), lit(1))).as("_ct"))
    val totR = counts.agg(sum(col("_cr")).as("_nr"), count(lit(1)).as("_v"))
    val totT = counts.agg(sum(col("_ct")).as("_nt"))
    counts.crossJoin(broadcast(totR)).crossJoin(broadcast(totT))
      .select(col("_w"),
        (log((col("_ct") + 1) / (col("_nt") + col("_v"))) -
          log((col("_cr") + 1) / (col("_nr") + col("_v")))).as("_lr"))
  }

  /** Score documents against a precomputed [[dsirRatio]] frame: one row
    * per doc with ≥1 in-vocabulary token — (idCol, n_tokens, weight,
    * selected), `weight` = avg log ratio at 4dp, `selected` =
    * weight > 0. `n_tokens` counts the in-vocabulary tokens the average
    * runs over (out-of-vocabulary tokens carry no evidence — on the
    * training corpus itself the vocabulary is total, so this is exactly
    * the corpus token count). */
  def scoreWith(ratio: DataFrame, docs: DataFrame, textCol: String,
                idCol: String): DataFrame = {
    import graft.text.TextFunctions.unigrams
    val w4 = floor(col("_aw") * lit(10000.0d) + lit(0.5d)) / lit(10000.0d)
    unigrams(docs, textCol, col(idCol)).join(ratio, "_w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("_lr")).as("_aw"))
      .select(col(idCol), col("n_tokens"), w4.as("weight"),
        (w4 > 0).as("selected"))
  }

  /** @param raw    the full corpus (idCol, textCol)
    * @param target the in-domain sample (textCol; ids ignored)
    * @return one row per raw doc: (idCol, n_tokens, weight, selected)
    *         — `weight` = avg log ratio at 4dp, `selected` = weight > 0
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
                  idCol: String): DataFrame =
    scoreWith(dsirRatio(raw, target, textCol), raw, textCol, idCol)
}
