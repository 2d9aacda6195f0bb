package graft

import graft.dims.Scd2
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** SCD Type-2 history build (dims.Scd2): change-collapse + interval
  * assembly semantics, and the one-exchange/one-sort plan shape that
  * makes it a single-shuffle operator at scale. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def changes = Seq(
    // (key, seq, status) — status stream with a repeated run
    (1L, 1L, "new"), (1L, 2L, "new"), (1L, 3L, "active"),
    (1L, 4L, "active"), (1L, 5L, "churned"),
    (2L, 1L, "new"),
  ).toDF("id", "seq", "status")
    .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("seq") * 60))

  test("consecutive equal attribute runs collapse into one version") {
    val hist = Scd2.fromChanges(changes, Seq("id"), "ts", "seq", Seq("status"))
      .select(col("id"), col("status"),
        unix_seconds(col("valid_from")).as("f"),
        unix_seconds(col("valid_to")).as("t"), col("is_current"))
      .orderBy("id", "f").collect()
    assert(hist.length == 4)
    assert(hist(0) == Row(1L, "new", 1700000060L, 1700000180L, false))
    assert(hist(1) == Row(1L, "active", 1700000180L, 1700000300L, false))
    assert(hist(2) == Row(1L, "churned", 1700000300L, null, true))
    assert(hist(3) == Row(2L, "new", 1700000060L, null, true))
  }

  test("intervals tile: each version's valid_to is the next valid_from") {
    val hist = Scd2.fromChanges(changes, Seq("id"), "ts", "seq", Seq("status"))
    val bad = hist.alias("a").join(hist.alias("b"),
        col("a.id") === col("b.id") &&
          col("a.valid_to") === col("b.valid_from") &&
          col("a.valid_to").isNotNull, "left_anti")
      .filter(col("a.valid_to").isNotNull)
    assert(bad.count() == 0)
    // exactly one current row per key
    val cur = hist.filter(col("is_current")).groupBy("id").count()
      .filter(col("count") =!= 1)
    assert(cur.count() == 0)
  }

  test("equal timestamps: tiebreaker orders versions; earlier gets a zero-length interval") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("id", "seq", "status")
      .withColumn("ts", timestamp_seconds(lit(1700000000L)))
    val hist = Scd2.fromChanges(df, Seq("id"), "ts", "seq", Seq("status"))
      .orderBy("valid_from", "status").collect()
    assert(hist.length == 2)
    // seq orders the two same-instant changes: "a" closes at its own
    // open instant ([t, t) zero-length), "b" is current
    val a = hist.find(_.getString(1) == "a").get
    val b = hist.find(_.getString(1) == "b").get
    assert(a.getAs[java.sql.Timestamp]("valid_from") ==
      a.getAs[java.sql.Timestamp]("valid_to"))
    assert(b.getAs[Boolean]("is_current") && !a.getAs[Boolean]("is_current"))
  }

  test("plan shape: one exchange, one sort for both window passes") {
    val hist = Scd2.fromChanges(changes, Seq("id"), "ts", "seq", Seq("status"))
    hist.collect()
    val plan = hist.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def n(pat: String): Int = pat.r.findAllIn(plan).length
    assert(n("Exchange hashpartitioning") == 1,
      s"expected 1 shuffle:\n${plan.take(1500)}")
    assert(n("\\bSort \\[") == 1,
      s"expected 1 sort (shared by both windows):\n${plan.take(1500)}")
  }
}
