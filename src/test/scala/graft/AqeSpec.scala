package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution proofs: the runtime re-planning SURVEY §4
  * counts on at 100 TB — skew-join splitting (the automatic complement
  * to the manual `plans.SaltedJoin`) and shuffle coalescing. */
class AqeSpec extends SparkSpec {

  test("AQE splits a skewed partition in a sort-merge join at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // shrink thresholds so the test-sized skew triggers the optimization
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    // left: one pathological key (200k rows) among uniform keys. The pad
    // must be incompressible — skew detection reads the COMPRESSED map
    // output sizes, and a constant pad would deflate under the threshold
    val rnd = new scala.util.Random(5)
    val left = ((1 to 200000).map(_ => 0L) ++ (1L to 2000L))
      .map(k => (k, s"pad-$k-${rnd.alphanumeric.take(48).mkString}"))
      .toDF("k", "lv")
    val right = (0L to 2000L).map(k => (k, s"r$k")).toDF("k", "rv")
    val joined = left.join(right, "k")
    // execute THIS queryExecution (count() would build a different one)
    // so AQE's final re-planned shape is what we inspect
    assert(joined.collect().length == 202000)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected a skew-split SMJ in:\n${plan.take(2000)}")
  }

  test("AQE coalesces an over-partitioned shuffle") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "200") // absurd for 1k rows
    import s.implicits._
    val agg = (1L to 1000L).map(k => (k % 10, k)).toDF("g", "v")
      .groupBy("g").agg(sum("v"))
    assert(agg.collect().length == 10)
    // the final stage ran with far fewer than 200 reducers
    val coalesced = agg.queryExecution.executedPlan.toString
      .contains("AQEShuffleRead coalesced")
    assert(coalesced,
      s"expected coalesced AQEShuffleRead in:\n${agg.queryExecution.executedPlan.toString.take(1500)}")
  }
}
