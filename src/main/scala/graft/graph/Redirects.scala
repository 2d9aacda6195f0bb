package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution — the frontier step BEFORE URL
  * dedup: archived crawls carry 301/302 maps (src → dst), and the
  * canonical identity of a page is its chain's FINAL target, not the
  * URL that was fetched. Collapsing `a → b → c` onto `c` before the
  * canonical-URL groupBy (q288) is what stops one logical page from
  * surviving dedup once per redirect hop.
  *
  * Resolution is POINTER DOUBLING, not per-hop iteration: each round
  * joins the current mapping with itself, so `maxHops` needs only
  * ⌈log2(maxHops)⌉ shuffle rounds — at 100 TB a 32-hop budget costs 5
  * self-joins of an (8-byte, 8-byte) key frame, never a driver loop
  * over rows. Cycles and over-budget chains are detected structurally:
  * a chain is unresolved when, after the hop budget, its target STILL
  * has an out-edge (self-loops, 2-cycles, and deep chains all land
  * here) — those rows keep `final_id` NULL so downstream dedup can
  * quarantine rather than mis-assign them.
  *
  * Input `edges`: one row per redirect (`src`, `dst`), at most one
  * out-edge per src (HTTP gives exactly one Location per URL; callers
  * with conflicting observations dedup first — latest-fetch-wins is a
  * groupBy upstream).
  */
object Redirects {

  /** Resolve every chain to (src, final_id, unresolved). Sources with
    * no out-edge are NOT in the output (they are their own final —
    * callers left-join and coalesce, see q304). */
  def resolve(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    var t = edges.select(col("src"), col("dst").as("tgt"))
    var hops = 1
    while (hops < maxHops) {
      // t2(u) = t(t(u)) where defined, else t(u): one self-join doubles
      // the hop horizon; targets that are terminal just pass through
      val step = t.select(col("src").as("_s2"), col("tgt").as("_t2"))
      t = t.join(step, t("tgt") === step("_s2"), "left")
        .select(col("src"), coalesce(col("_t2"), col("tgt")).as("tgt"))
      hops *= 2
      // MATERIALIZE each round (truncate lineage): without this, the
      // self-join references its own unexecuted subtree TWICE, so the
      // plan doubles per round — 2^rounds copies of the base scan (the
      // ScaleProbe `redirects` depth-64 arm read 100 s before this
      // line, 3 s after). localCheckpoint keeps the frame usable by
      // the caller with no explicit unpersist contract.
      if (hops < maxHops) t = t.localCheckpoint(true)
    }
    // a target that still redirects after the budget = cycle/too-deep
    val outs = edges.select(col("src").as("_o")).distinct()
    t.join(outs, t("tgt") === outs("_o"), "left")
      .select(col("src"),
        when(col("_o").isNull, col("tgt")).as("final_id"),
        col("_o").isNotNull.as("unresolved"))
  }
}
