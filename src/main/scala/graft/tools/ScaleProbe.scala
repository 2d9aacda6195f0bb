package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the composed dedup pipeline (exact-first, then fuzzy) on the
  * scaled dataset — the production-shape counterpoint to running n-gram
  * Jaccard directly over a corpus full of exact duplicates. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("exact-dedup survivors") {
      Dedup.exact(docs, "text", "doc_id").count()
    }
    time("exact-first THEN ngram-jaccard") {
      val surv = Dedup.exact(docs, "text", "doc_id")
      Dedup.ngramJaccardPairs(surv, "text", "doc_id",
        n = 3, threshold = 0.2, maxShingleFreq = 1000).count()
    }
    spark.stop()
  }
}
