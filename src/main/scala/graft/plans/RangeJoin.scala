package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: all pairs (l, r) sharing `key` with
  * `r.ts ∈ (l.ts, l.ts + window]` — the "what happened in the W seconds
  * after each event" enrichment (the reference's only range predicate is
  * the serving query's day window, cache_manager/service.py:43-45; this
  * generalizes it to pairwise form).
  *
  * A naive theta-join `l.key = r.key AND r.ts BETWEEN ...` makes Spark
  * fall back to a broadcast-nested-loop or a single-key sort-merge with a
  * post-filter over the full per-key cross product — quadratic in events
  * per key. Instead both sides are bucketed into window-sized time cells:
  * any right row in (t, t+W] lives in bucket(t) or bucket(t)+1, so the
  * LEFT side explodes into those two cells (2× row inflation, bounded)
  * and the join becomes a plain equi-join on (key, bucket) + an exact
  * range filter. Each side shuffles ONCE on (key, bucket); per-task work
  * is proportional to genuinely-near-in-time pairs. Survives 100 TB:
  * partition count scales with distinct (key, cell), skew only where a
  * single key genuinely has a hot window (then salt the key upstream).
  *
  * Left/right column names (other than `key`) must be disjoint.
  */
object RangeJoin {

  def within(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    val overlap = left.columns.filterNot(_ == key)
      .intersect(right.columns.filterNot(_ == key))
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlap.mkString(",")}")
    val w = windowSec * 1000000L // bucket width in microseconds
    val l = left.withColumn("_b",
      explode(array(
        floor(unix_micros(col(leftTs)) / w),
        floor(unix_micros(col(leftTs)) / w) + 1)))
    val r = right.withColumn("_b", floor(unix_micros(col(rightTs)) / w))
    l.join(r, Seq(key, "_b"))
      .filter(unix_micros(col(rightTs)) > unix_micros(col(leftTs)) &&
        unix_micros(col(rightTs)) <= unix_micros(col(leftTs)) + w)
      .drop("_b")
    // no dedup needed: a right row has ONE bucket value, so each (l, r)
    // pair joins through exactly one of the left row's two cells
  }
}
