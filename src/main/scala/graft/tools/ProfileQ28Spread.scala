package graft.tools

import graft.pipeline.{Pipeline, SyntheticStaging}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Compares pipeline e2e cost for different staging spread widths. */
object ProfileQ28Spread {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(spread: Int): Double = {
      val staged0 = SyntheticStaging.fromOrders(spark, sfDir)
      val staged = if (spread > 0) staged0.repartition(spread) else staged0
      val t0 = System.nanoTime()
      val w = Pipeline.run(spark, staged, Pipeline.emptyWarehouse(spark), "2024-01-01")
      w.events.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    run(0) // warm
    Seq(0, 4, 8, 16, 32).foreach { sp =>
      val times = (1 to 3).map(_ => run(sp))
      println(f"[spread] $sp%2d best=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
