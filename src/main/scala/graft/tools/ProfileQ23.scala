package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileQ23 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $l ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sig = Dedup.minhashSignature(docs, "text", "doc_id")
    time("signatures")(sig.count())
    val buckets = Dedup.lshBuckets(sig, "doc_id")
    time("buckets")(buckets.count())
    val pairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val n = time("pairs-distinct")(pairs.count())
    println(s"[stage] n_pairs=$n")
    spark.stop()
  }
}
