package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key serial slot assignment with a measured skew switch — the
  * politeness scheduler's core step (q305: each host's frontier URLs
  * get slots spaced by the host's own crawl-delay).
  *
  * Two physical forms compute the same `row_number() OVER (PARTITION
  * BY key ORDER BY order)`:
  *
  *   - `Window.partitionBy(key)`: ONE hash shuffle, but every row of
  *     a key lands on one task — a CDN-sized host with 10^7 frontier
  *     URLs serializes on one core;
  *   - [[GlobalOrder.withGroupedRowNumber]]: a range shuffle + a
  *     segment join (a hot key spans partitions), skew-proof but
  *     ~2 shuffles + a materialization.
  *
  * Neither dominates: the interleaved AB pairs (AB host_slot_*_2m,
  * 2M rows, same downstream aggregate) measured the window form
  * 3.1× FASTER with uniform 10-row hosts and 2.7× SLOWER with one
  * host holding 90% of rows. So this operator probes first — one
  * cheap aggregate over the key column (map-side partial counts; at
  * 100 TB the scan is column-pruned to the key) — and picks the form
  * by the LARGEST key's row count, the exact quantity that breaks the
  * window form. The probe is the same runtime-statistics play AQE
  * makes for skew joins, applied to a window.
  *
  * [[DefaultSkewThreshold]] (1M rows): a single task ranking 1M
  * in-memory (key,order) pairs is sub-second — below that the window
  * form's single shuffle wins (measured above); far above it, one
  * task becomes minutes while the rest of the cluster idles.
  *
  * Equality of the two forms is GlobalOrderSpec's pinned contract;
  * HostSlotsSpec pins that both branches return identical frames and
  * that the switch actually fires on a skewed input.
  */
object HostSlots {

  /** Max rows on one key before the per-key window's single task is
    * the bottleneck. */
  val DefaultSkewThreshold: Long = 1L << 20

  /** `row_number() OVER (PARTITION BY key ORDER BY order)` as column
    * `out` (BIGINT), physical form chosen by the probed max-key size.
    * `order` must be total within a key for a deterministic result
    * (same requirement as the window form). */
  def assign(df: DataFrame, key: String, order: Seq[Column], out: String,
             skewThreshold: Long = DefaultSkewThreshold): DataFrame = {
    val maxPerKey = df.groupBy(col(key)).count()
      .agg(max(col("count"))).head().get(0)
    val skewed = maxPerKey != null &&
      maxPerKey.asInstanceOf[Long] > skewThreshold
    if (skewed)
      GlobalOrder.withGroupedRowNumber(df, Seq(key), order, out)
    else
      df.withColumn(out, row_number().over(
        Window.partitionBy(col(key)).orderBy(order: _*)).cast("bigint"))
  }
}
