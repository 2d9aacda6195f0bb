package graft

import graft.sketch.HistQuantile.hist_quantile
import org.apache.spark.sql.functions._

class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("estimate tracks exact percentile within one bin width") {
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(hist_quantile($"v", 0.5, 0.0, 10000.0, 1000).as("p50"),
        hist_quantile($"v", 0.95, 0.0, 10000.0, 1000).as("p95"))
      .head()
    val binW = 10.0
    assert(math.abs(got.getDouble(1) - 5000.0) <= binW)
    assert(math.abs(got.getDouble(2) - 9500.0) <= binW)
  }

  test("partitioning does not change the estimate (merge is exact)") {
    val vals = (1 to 5000).map(i => (i % 97).toDouble * 3.37)
    val one = vals.toDF("v").coalesce(1)
      .agg(hist_quantile($"v", 0.9, 0.0, 400.0, 64)).head().getDouble(0)
    val many = vals.toDF("v").repartition(13)
      .agg(hist_quantile($"v", 0.9, 0.0, 400.0, 64)).head().getDouble(0)
    assert(one == many)
  }

  test("out-of-range values clamp into edge bins; nulls ignored") {
    val df = Seq(Some(-50.0), Some(0.5), Some(9.5), Some(400.0), None)
      .toDF("v")
    val n = df.agg(hist_quantile($"v", 0.0, 0.0, 10.0, 10)).head().getDouble(0)
    // rank 1 of 4 values lands in bin 0 (the clamped -50 counts there)
    assert(n >= 0.0 && n <= 1.0)
  }

  test("empty group yields null") {
    val df = Seq.empty[Double].toDF("v")
    assert(df.agg(hist_quantile($"v", 0.5, 0.0, 1.0, 4)).head().isNullAt(0))
  }
}
