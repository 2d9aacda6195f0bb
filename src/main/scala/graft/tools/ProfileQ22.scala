package graft.tools

import graft.text.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing for the jaccard plan. */
object ProfileQ22 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("scan")(docs.count())
    val sh = docs.select(col("doc_id").as("id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), 3))).as("shingle"))
    time("shingle-explode")(sh.count())
    val docLists = sh.groupBy("shingle")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    time("doclists")(docLists.count())
    val pairComb = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, greatest(size(col("ids")) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))
    val pairs = docLists.select(explode(pairComb).as("p"))
      .groupBy(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("pairs")(pairs.count())
    time("full-query")(graft.SparkEntry.queries("q22_ngram_jaccard")(spark, sfDir).count())
    spark.stop()
  }
}
