package graft

import graft.sketch.{HllBuffer, HllSketch}
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within rel-error bounds of exact distinct (p=9 → ~4.6%)") {
    val n = 20000
    val df = (1 to n).map(i => s"token_$i").toDF("t")
    val est = df.agg(HllSketch.hll_distinct(col("t"), 9)).head().getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.15, s"est=$est exact=$n")
  }

  test("duplicates do not move the estimate") {
    val df = ((1 to 1000) ++ (1 to 1000) ++ (1 to 1000))
      .map(i => s"v$i").toDF("t")
    val est = df.agg(HllSketch.hll_distinct(col("t"), 9)).head().getLong(0)
    val estOnce = (1 to 1000).map(i => s"v$i").toDF("t")
      .agg(HllSketch.hll_distinct(col("t"), 9)).head().getLong(0)
    assert(est == estOnce)
  }

  test("per-group sketches merge map-side (partition count independent)") {
    val df = (1 to 5000).map(i => (i % 3, s"g${i % 3}_v$i")).toDF("g", "t")
    val one = df.repartition(1).groupBy("g")
      .agg(HllSketch.hll_distinct(col("t"), 9).as("e")).orderBy("g")
      .collect().map(_.getLong(1)).toSeq
    val many = df.repartition(13).groupBy("g")
      .agg(HllSketch.hll_distinct(col("t"), 9).as("e")).orderBy("g")
      .collect().map(_.getLong(1)).toSeq
    assert(one == many) // register max-merge is order/partitioning-proof
  }

  test("small-range correction engages for tiny cardinalities") {
    val df = Seq("a", "b", "c", "a").toDF("t")
    val est = df.agg(HllSketch.hll_distinct(col("t"), 9)).head().getLong(0)
    assert(est == 3L) // linear counting is exact this far below m
  }

  test("buffer rho math: zero suffix gets max rank") {
    val b = new HllBuffer(9)
    b.update(5L)        // w = 5 >>> 9 = 0 -> rho = 56 at bucket 5
    assert(b.registers(5) == 56.toByte)
    b.update(512L)      // w = 1 -> clz=63 -> rho = 55 at bucket 0
    assert(b.registers(0) == 55.toByte)
  }

  test("nulls are skipped") {
    val df = Seq(Some("a"), None, Some("b")).toDF("t")
    val est = df.agg(HllSketch.hll_distinct(col("t"), 9)).head().getLong(0)
    assert(est == 2L)
  }
}
