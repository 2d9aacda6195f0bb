package graft.tools

import graft.pipeline.{Pipeline, SyntheticStaging}
import org.apache.spark.sql.SparkSession

/** Scratch stage-timing for the e2e pipeline. */
object ProfileQ28 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val staged = SyntheticStaging.fromOrders(spark, sfDir)
    time("staging-count")(staged.count())
    val t0 = System.nanoTime()
    val w = time("pipeline-run (incl. summary job)")(
      Pipeline.run(spark, staged, Pipeline.emptyWarehouse(spark), "2024-01-01"))
    time("events-count")(w.events.count())
    time("edges-count")(w.artistGenres.count() + w.eventGenres.count())
    println(f"[stage] total ${(System.nanoTime() - t0) / 1e9}%.2f s  summary=${w.summary}")
    spark.stop()
  }
}
