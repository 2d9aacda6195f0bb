package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalOrder must be bit-identical to the single-partition
  * `Window.orderBy(...)` forms it replaces — including NTILE's
  * remainder rule — while planning a range-partitioned sort instead of
  * funnelling the data through one task. */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  // values with heavy duplication (ties span range-partition borders),
  // unique id tiebreaker makes the order total
  private def data(n: Int): DataFrame =
    spark.range(n).select(col("id"),
      (col("id") * 37 % 11).as("v"),
      ((col("id") * 13 % 7) * 100).cast("bigint").as("amt"))
      .repartition(8)

  private val ord = Seq(col("v").desc, col("id"))

  test("withRowNumber equals single-partition row_number") {
    val df = data(1000).cache()
    val got = GlobalOrder.withRowNumber(df, ord, "rn", partitions = 8)
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("bigint"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    df.unpersist()
  }

  test("withNtile equals single-partition ntile incl. remainder rule") {
    // n % k != 0 cases, k > n case, k = 1 case
    for ((n, k) <- Seq((1000, 4), (997, 10), (5, 9), (100, 1))) {
      val df = data(n).cache()
      val got = GlobalOrder.withNtile(df, ord, k, "b", partitions = 8)
      val want = df.withColumn("b",
        ntile(k).over(Window.orderBy(col("v").desc, col("id"))))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile($k) over $n rows diverged")
      df.unpersist()
    }
  }

  test("withRunningSumLong equals single-partition running sum + rn") {
    val df = data(1000).cache()
    val got = GlobalOrder.withRunningSumLong(df, ord, col("amt"), "cum",
      rnOut = Some("rn"), partitions = 8)
    val w = Window.orderBy(col("v").desc, col("id"))
    val want = df
      .withColumn("cum", sum(col("amt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("bigint"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    df.unpersist()
  }

  test("withGroupedRowNumber equals per-key window row_number") {
    // key sizes from 1 row to ~dominant; unique id makes order total
    val df = spark.range(2000).select(col("id"),
      when(col("id") < 1200, lit(0L))          // one hot key: 60% of rows
        .otherwise(pmod(col("id"), lit(37L))).as("h"),
      (col("id") * 31 % 1000).as("ts"))
      .repartition(8).cache()
    val got = GlobalOrder.withGroupedRowNumber(df, Seq("h"),
      Seq(col("ts"), col("id")), "rn", partitions = 8)
    val want = df.withColumn("rn", row_number().over(
      Window.partitionBy(col("h")).orderBy(col("ts"), col("id")))
      .cast("bigint"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    df.unpersist()
  }

  test("withGroupedRowNumber: a hot key spans partitions; no data-sized window") {
    val df = spark.range(4000).select(col("id"), lit(7L).as("h"))
    val out = GlobalOrder.withGroupedRowNumber(df, Seq("h"),
      Seq(col("id")), "rn", partitions = 8)
    // the single key's rows still occupy all 8 range partitions — the
    // whole point vs Window.partitionBy(h), which would use one task
    val ranked = df.repartitionByRange(8, col("h"), col("id"))
      .sortWithinPartitions(col("h"), col("id"))
    assert(ranked.rdd.mapPartitions(it => Iterator(it.size))
      .collect().count(_ > 0) == 8)
    // ranks are exact 1..n
    import spark.implicits._
    val rns = out.select("rn").as[Long].collect().sorted
    assert(rns.head == 1L && rns.last == 4000L && rns.distinct.length == 4000)
    // the only window in the plan runs over the segment frame (keyed
    // on _go_pid), never the data
    val plan = out.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("_go_pid")),
      s"unexpected data-sized window in:\n${windowLines.mkString("\n")}")
  }

  test("deterministic across runs and input partitionings") {
    val a = GlobalOrder.withRowNumber(data(500), ord, "rn", partitions = 8)
    val b = GlobalOrder.withRowNumber(data(500).repartition(3), ord, "rn",
      partitions = 8)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("empty input and collision guard") {
    val empty = data(0)
    assert(GlobalOrder.withRowNumber(empty, ord, "rn").count() == 0L)
    assert(GlobalOrder.withNtile(empty, ord, 4, "b").count() == 0L)
    val bad = data(10).withColumn("_go_pid", lit(1))
    intercept[IllegalArgumentException] {
      GlobalOrder.withRowNumber(bad, ord, "rn")
    }
  }

  test("plan: range-partitioned sort, data never hits one partition") {
    val out = GlobalOrder.withRowNumber(data(1000), ord, "rn", partitions = 8)
    // the ranked frame is materialized (eager localCheckpoint) so both the
    // per-row branch and the offsets branch read the SAME evaluation; the
    // range sort therefore lives in the checkpointed RDD's lineage, and the
    // downstream plan reads it as an RDD scan — never a single partition
    assert(out.rdd.getNumPartitions == 8,
      s"expected 8 range partitions, got ${out.rdd.getNumPartitions}")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      s"expected materialized ranked frame scan in:\n$plan")
    // the only Window node runs over the per-partition offsets frame
    // (bounded by the partition count), keyed on _go_pid
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("_go_pid")),
      s"unexpected data-sized window in:\n${windowLines.mkString("\n")}")
    // and the checkpointed lineage itself was produced by a range sort
    val ranked = data(1000).repartitionByRange(8, ord: _*)
      .sortWithinPartitions(ord: _*)
      .queryExecution.executedPlan.toString
    assert(ranked.contains("rangepartitioning") ||
      ranked.contains("RangePartitioning"), s"no range sort in:\n$ranked")
  }
}
