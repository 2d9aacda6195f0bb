package graft

import graft.plans.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  test("within pairs rows in (t, t+W] per key, no duplicates across cells") {
    val W = 10L // seconds
    val left = Seq( // (key, l_id, l_ts in seconds)
      (1L, 100L, 0L),
      (1L, 101L, 9L),   // crosses a cell boundary: window (9, 19] spans cells 0 and 1
      (2L, 200L, 0L),
    ).map { case (k, id, s) => (k, id, ts(s * 1000000L)) }
      .toDF("user_id", "l_id", "l_ts")
    val right = Seq(
      (1L, 10L, 0L),   // equal time -> excluded (strict >)
      (1L, 11L, 5L),   // pairs with 100
      (1L, 12L, 10L),  // pairs with 100 (boundary, inclusive) and 101
      (1L, 13L, 19L),  // pairs with 101 only (window (9, 19])
      (1L, 14L, 20L),  // outside both
      (2L, 20L, 11L),  // outside for key 2 (window (0, 10])
    ).map { case (k, id, s) => (k, id, ts(s * 1000000L)) }
      .toDF("user_id", "r_id", "r_ts")

    val out = RangeJoin.within(left, right, "user_id", "l_ts", "r_ts", W)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 11L), (100L, 12L), (101L, 12L), (101L, 13L)))
  }

  test("disjoint-name requirement is enforced") {
    val df = Seq((1L, ts(0L))).toDF("user_id", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.within(df, df, "user_id", "t", "t", 10L)
    }
  }

  test("matches DuckDB-oracle shape on events: count equals theta-join") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("ts"))
    val l = e.select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = e.select(col("user_id"), col("event_id").as("r_id"), col("ts").as("r_ts"))
    val bucketed = RangeJoin.within(l, r, "user_id", "l_ts", "r_ts", 300L).count()
    val theta = l.join(r, Seq("user_id"))
      .filter(unix_micros(col("r_ts")) > unix_micros(col("l_ts")) &&
        unix_micros(col("r_ts")) <= unix_micros(col("l_ts")) + 300000000L)
      .count()
    assert(bucketed == theta)
  }
}
