package graft.tools

import graft.ingest.StagingReader
import org.apache.spark.sql.SparkSession

/** Drives the typed Dataset[EventDto] ingest boundary end-to-end:
  * runMain graft.tools.TypedIngestDemo <stagingDir> */
object TypedIngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ds = StagingReader.readStagedTyped(spark, args.head)
    val dtos = ds.collect()
    dtos.foreach { d =>
      println(s"[typed] artist=${d.artist_data.flatMap(_.name)} " +
        s"related=${d.artist_data.flatMap(_.related_artists).getOrElse(Nil).map(r => (r.name, r.wwoz_artist_href))}")
    }
    println(s"[typed] total=${dtos.length}")
    spark.stop()
  }
}
