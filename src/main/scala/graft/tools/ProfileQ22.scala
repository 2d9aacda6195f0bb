package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing for the jaccard plan (current hashed-shingle
  * path): every stage timed WARM (second run) so codegen/JIT noise is
  * excluded. */
object ProfileQ22 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val full = Dedup.ngramJaccardPairs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id",
      n = 3, threshold = 0.2, maxShingleFreq = 1000)
    time("pairs-unsorted")(full.count())
    time("full-with-orderby")(full.orderBy(col("id_a"), col("id_b")).count())
    spark.stop()
  }
}
