package graft

import graft.plans.{AsOfJoin, AsOfJoinExec, AsOfJoinPhysical}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class AsOfJoinPlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  // quotes at (key, time); trades to enrich
  private def trades = Seq(
    ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 35L, "t3"),
    ("B", 5L, "b1"),  ("B", 50L, "b2"),
    ("C", 7L, "c1"), // no quotes for C at all
  ).toDF("sym", "t_time", "trade_id")

  private def quotes = Seq(
    ("A", 8L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0),
    ("B", 40L, 200.0),
    ("D", 1L, 999.0), // key with no trades
  ).toDF("sym", "q_time", "px")

  test("backward as-of picks latest quote <= trade time; unmatched dropped") {
    val out = AsOfJoinPhysical.join(trades, quotes, "sym", "t_time", "q_time")
      .select($"trade_id", $"px").as[(String, Double)].collect().toMap
    // t1@10 -> q@8; t2@20 -> q@20 (inclusive); t3@35 -> q@30;
    // b1@5 unmatched (dropped); b2@50 -> q@40; c1 unmatched
    assert(out == Map("t1" -> 100.0, "t2" -> 101.0, "t3" -> 102.0,
      "b2" -> 200.0))
  }

  test("forward as-of picks earliest quote >= trade time") {
    val out = AsOfJoinPhysical.join(trades, quotes, "sym", "t_time", "q_time",
        direction = "forward")
      .select($"trade_id", $"px").as[(String, Double)].collect().toMap
    // t1@10 -> q@20; t2@20 -> q@20; t3@35 unmatched; b1@5 -> q@40;
    // b2@50 unmatched; c1 unmatched
    assert(out == Map("t1" -> 101.0, "t2" -> 101.0, "b1" -> 200.0))
  }

  test("physical plan: AsOfJoinExec with one shuffle per side, no window") {
    val df = AsOfJoinPhysical.join(trades, quotes, "sym", "t_time", "q_time")
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: AsOfJoinExec => e }.size == 1)
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e }.size == 2)
    assert(collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty)
  }

  test("matches the compositional window-based AsOfJoin on dense data") {
    val left = (1 to 400).map(i =>
      ((i % 7).toLong, i.toLong * 3 % 101, s"L$i")).toDF("k", "lt", "lid")
    val right = (1 to 300).map(i =>
      ((i % 7).toLong, i.toLong * 5 % 97, i.toLong)).toDF("k", "rt", "rid")
      // one right row per (k, rt): both impls then agree deterministically
      .groupBy("k", "rt").agg(max("rid").as("rid"))
    val viaExec = AsOfJoinPhysical.join(left, right, "k", "lt", "rt")
      .select($"lid", $"rid", $"rt").as[(String, Long, Long)].collect().toSet
    val viaWindow = AsOfJoin.join(left, right, "k", "lt", "rt", "rid")
      .select($"lid", $"rid", $"rt").as[(String, Long, Long)].collect().toSet
    assert(viaExec == viaWindow)
    assert(viaExec.nonEmpty)
  }

  test("tolerance drops matches farther than the bound (backward + forward)") {
    val back = AsOfJoinPhysical.join(trades, quotes, "sym", "t_time",
        "q_time", tolerance = Some(5L))
      .select($"trade_id", $"px").as[(String, Double)].collect().toMap
    // t1@10 -> q@8 (diff 2 ok); t2@20 -> q@20 (0); t3@35 -> q@30 (5, at
    // the bound, kept); b2@50 -> q@40 (10 > 5, dropped)
    assert(back == Map("t1" -> 100.0, "t2" -> 101.0, "t3" -> 102.0))
    val fwd = AsOfJoinPhysical.join(trades, quotes, "sym", "t_time",
        "q_time", direction = "forward", tolerance = Some(10L))
      .select($"trade_id", $"px").as[(String, Double)].collect().toMap
    // t1@10 -> q@20 (10 ok); t2@20 -> q@20 (0); b1@5 -> q@40 (35, dropped)
    assert(fwd == Map("t1" -> 101.0, "t2" -> 101.0))
  }

  test("tolerance equals the compositional join + post-filter") {
    val left = (1 to 400).map(i =>
      ((i % 7).toLong, i.toLong * 3 % 101, s"L$i")).toDF("k", "lt", "lid")
    val right = (1 to 300).map(i =>
      ((i % 7).toLong, i.toLong * 5 % 97, i.toLong)).toDF("k", "rt", "rid")
      .groupBy("k", "rt").agg(max("rid").as("rid"))
    val viaExec = AsOfJoinPhysical.join(left, right, "k", "lt", "rt",
        tolerance = Some(7L))
      .select($"lid", $"rid", $"rt").as[(String, Long, Long)].collect().toSet
    val viaFilter = AsOfJoin.join(left, right, "k", "lt", "rt", "rid")
      .filter($"lt" - $"rt" <= 7L)
      .select($"lid", $"rid", $"rt").as[(String, Long, Long)].collect().toSet
    assert(viaExec == viaFilter)
    assert(viaExec.nonEmpty)
  }

  test("tolerance keeps the 2-exchange no-window plan shape") {
    val df = AsOfJoinPhysical.join(trades, quotes, "sym", "t_time", "q_time",
      tolerance = Some(5L))
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: AsOfJoinExec => e }.size == 1)
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e }.size == 2)
    assert(collectWithSubqueries(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty)
    // no Filter above the exec either: tolerance lives inside the merge
    assert(collectWithSubqueries(plan) {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.child.isInstanceOf[AsOfJoinExec] => f }.isEmpty)
  }

  test("strict comparison (allowEqual = false) excludes the equal instant") {
    val out = AsOfJoinPhysical.join(trades, quotes, "sym", "t_time",
        "q_time", allowEqual = false)
      .select($"trade_id", $"px").as[(String, Double)].collect().toMap
    // t2@20 now matches q@8? No: latest quote strictly before 20 is q@8
    // (q@20 excluded) -> 100.0; others unchanged
    assert(out == Map("t1" -> 100.0, "t2" -> 100.0, "t3" -> 102.0,
      "b2" -> 200.0))
  }

  test("tolerance on a non-integral time column is rejected") {
    val l = Seq(("A", 10.0, "t1")).toDF("sym", "t_time", "trade_id")
    val r = Seq(("A", 8.0, 1.0)).toDF("sym", "q_time", "px")
    val ex = intercept[Exception] {
      AsOfJoinPhysical.join(l, r, "sym", "t_time", "q_time",
        tolerance = Some(5L)).collect()
    }
    assert(ex.getMessage.contains("integral time column"))
  }

  test("right rows tied on (key, time) resolve to the last in sort order") {
    // two quotes at the same instant: merge keeps the later-sorted one;
    // pre-deduped input keeps results engine-independent (as the queries
    // do), but raw ties must still not duplicate output rows
    val l = Seq(("A", 10L, "t1")).toDF("sym", "t_time", "trade_id")
    val r = Seq(("A", 10L, 1.0), ("A", 10L, 2.0)).toDF("sym", "q_time", "px")
    val out = AsOfJoinPhysical.join(l, r, "sym", "t_time", "q_time")
      .select($"trade_id", $"px").collect()
    assert(out.length == 1) // exactly one match, never a fan-out
  }
}
