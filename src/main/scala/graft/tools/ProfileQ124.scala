package graft.tools

import graft.dedup.Dedup
import graft.graph.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for q124: pair generation vs connected components.
  * runMain graft.tools.ProfileQ124 <sfDir> [reps] */
object ProfileQ124 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      val docs = graft.Tables.documents(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
      var t0 = System.nanoTime()
      val pairs = Dedup.simhashHammingPairs(docs, "text", "doc_id")
        .select(col("id_a"), col("id_b")).localCheckpoint()
      val nPairs = pairs.count()
      println(f"[q124] rep$i pairs=$nPairs t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val cc = Graph.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs)
      val n = cc.count()
      println(f"[q124] rep$i cc_rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
