package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._

/** Typed Aggregator surface: Column-API udaf, SQL registration, and the
  * closed form all agree; zero-weight groups finish as NaN. */
class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0), ("b", 7.0, 2.0),
  ).toDF("k", "v", "w")

  test("udaf column API matches the closed form") {
    val wm = udaf(Aggregators.WeightedMean)
    val got = df.groupBy("k").agg(wm(col("v"), col("w")).as("m"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got(0) == ("a", 70.0 / 4.0))
    assert(got(1) == ("b", 24.0 / 4.0))
  }

  test("SQL registration matches the column API") {
    spark.udf.register("weighted_mean", udaf(Aggregators.WeightedMean))
    df.createOrReplaceTempView("wm_in")
    val got = spark.sql(
        "SELECT k, weighted_mean(v, w) AS m FROM wm_in GROUP BY k ORDER BY k")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq("a" -> 17.5, "b" -> 6.0))
  }

  test("zero total weight finishes as NaN, not a divide error") {
    val z = Seq(("a", 1.0, 0.0)).toDF("k", "v", "w")
    val wm = udaf(Aggregators.WeightedMean)
    val m = z.groupBy("k").agg(wm(col("v"), col("w"))).head().getDouble(1)
    assert(m.isNaN)
  }
}
