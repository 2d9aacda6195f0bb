package graft.tools

import graft.pipeline.{Pipeline, SyntheticStaging}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm fine-grained timing for the e2e pipeline: full query twice (second
  * run = the bench number), then each incremental sub-DAG warm so the
  * marginal cost of every stage is visible. */
object ProfileQ28Warm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = graft.SparkEntry.queries("q28_pipeline_e2e")
    q(spark, sfDir).count(); spark.catalog.clearCache()
    time("full-warm-1")(q(spark, sfDir).count()); spark.catalog.clearCache()
    time("full-warm-2")(q(spark, sfDir).count()); spark.catalog.clearCache()

    val staged = SyntheticStaging.fromOrders(spark, sfDir)
    time("staged")(staged.count())
    val stagedC = staged.cache(); stagedC.count()
    val (valid0, quar) = graft.ingest.StagingReader.validateSplit(stagedC)
    val valid = valid0.cache()
    time("validate+quarantine")(valid.count() + quar.count())
    // single-branch costs on the cached valid frame
    import graft.enrich.{EmbedStage, HashingEmbedder}
    val emb = new HashingEmbedder()
    time("artists-embed")(EmbedStage.embedColumnFast(
      valid.select(trim(col("artist_data.name")).as("name"),
        col("artist_data.description").as("d")).withColumn("_t",
        concat_ws(" ", col("name"), col("d"))), "_t", "e", emb).count())
    val w = time("pipeline-run+summary")(
      Pipeline.run(spark, stagedC, Pipeline.emptyWarehouse(spark), "2024-01-01"))
    time("events-count-cached")(w.events.count())
    spark.catalog.clearCache()
    spark.stop()
  }
}
