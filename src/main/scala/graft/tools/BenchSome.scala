package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm best-of-N timing for a subset of the declared queries:
  * `runMain graft.tools.BenchSome <sfDir> q22_ngram_jaccard q23_...`.
  *
  * `--full` executes each query's plan AS DECLARED
  * (`queryExecution.toRdd.count()`) instead of `df.count()`: the
  * count() action re-plans with an Aggregate on top, which lets
  * Catalyst prune payload columns and eliminate left joins against
  * aggregated (provably unique-key) right sides — correct planning,
  * but it can elide the very work a scale measurement is after (e.g.
  * q182's excision fold + md5 vanish under count()). */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val full = args.contains("--full")
    val names0 = args.drop(1).filterNot(_ == "--full").toSeq
    val names = if (names0.nonEmpty) names0
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (full) df.queryExecution.toRdd.count() else df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[bench] $name best=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
