package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: reproduce sf0.01 divergence (delete after diagnosis). */
class GlobalOrderDebugSpec extends SparkSpec {

  test("diagnose rn structure on sf0.01 orders agg") {
    val agg = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(datediff(lit("2001-08-02").cast("date"),
        max(to_date(col("o_orderdate")))).as("rec_days"))
    val got = GlobalOrder.withRowNumber(agg,
      Seq(col("rec_days"), col("o_custkey")), "rn").cache()
    val n = got.count()
    val perm = got.select(countDistinct(col("rn")).as("d"),
      min(col("rn")).as("mn"), max(col("rn")).as("mx")).first()
    println(s"==== n=$n distinct_rn=${perm.getLong(0)} min=${perm.getLong(1)} max=${perm.getLong(2)} ====")
    // does rn order match key order? sort by key, compare rn to row_number
    val w = Window.orderBy(col("rec_days"), col("o_custkey"))
    val bad = got.withColumn("want", row_number().over(w).cast("bigint"))
      .filter(col("rn") =!= col("want"))
    println(s"==== rows where rn != want: ${bad.count()} ====")
    bad.orderBy("want").limit(5).collect().foreach(r => println(s"  $r"))
    // stability: evaluate got twice, same assignment?
    val again = GlobalOrder.withRowNumber(agg,
      Seq(col("rec_days"), col("o_custkey")), "rn")
    val unstable = got.join(again.withColumnRenamed("rn", "rn2"), "o_custkey")
      .filter(col("rn") =!= col("rn2")).count()
    println(s"==== unstable across evaluations: $unstable ====")
    got.unpersist()
  }
}
