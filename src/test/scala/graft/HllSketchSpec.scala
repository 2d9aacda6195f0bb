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

  test("hll_union_est: self-union is identity; disjoint union adds; " +
       "inclusion-exclusion recovers the overlap") {
    val left = (1 to 3000).map(i => ("a", s"common_$i"))
    val right = (1 to 3000).map(i => ("b", s"common_$i")) ++
      (1 to 1000).map(i => ("b", s"only_b_$i"))
    val df = (left ++ right).toDF("g", "t")
    val sk = df.groupBy("g").agg(HllSketch.hll_sketch(col("t"), 11).as("sk"))
    val a = sk.filter(col("g") === "a").select(col("sk").as("sk_a"))
    val b = sk.filter(col("g") === "b").select(col("sk").as("sk_b"))
    val r = a.crossJoin(b).select(
      HllSketch.hll_union_est(col("sk_a"), col("sk_a")).as("ea"),
      HllSketch.hll_union_est(col("sk_b"), col("sk_b")).as("eb"),
      HllSketch.hll_union_est(col("sk_a"), col("sk_b")).as("eu")).head()
    val (ea, eb, eu) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val directA = df.filter(col("g") === "a")
      .agg(HllSketch.hll_distinct(col("t"), 11)).head().getLong(0)
    assert(ea == directA) // self-union = plain estimate, bit-identical
    val inter = ea + eb - eu
    // true overlap 3000, union 4000; p=11 keeps rel-err ~2.3%
    assert(math.abs(eu - 4000).toDouble / 4000 < 0.1, s"eu=$eu")
    assert(math.abs(inter - 3000).toDouble / 3000 < 0.2, s"inter=$inter")
  }
}
