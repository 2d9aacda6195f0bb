package graft

import graft.streaming.StreamingIngest
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Structured-Streaming surface: file-source stream, windowed counts with
  * watermark, and the foreachBatch insert-if-absent merge (streaming A4). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts over a file stream equal the batch aggregation") {
    val sf = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sf)
    val streamed = StreamingIngest.eventStream(spark, sf)
    val agg = StreamingIngest.windowedCounts(streamed)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("win_counts")
      .orderBy("window_start_us", "event_type").collect()
    val want = StreamingIngest.windowedCounts(batchEvents)
      .orderBy("window_start_us", "event_type").collect()
    assert(got.length == want.length)
    assert(got.zip(want).forall { case (a, b) => a == b })
  }

  test("foreachBatch merge stream is insert-if-absent and idempotent") {
    val dir = Files.createTempDirectory("graft-stream-src")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir.toString + "/batch")
    val schema = spark.read.parquet(dir.toString + "/batch").schema

    val ckpt1 = Files.createTempDirectory("graft-ckpt2").toString
    val s1 = StreamingIngest.readStream(spark, dir.toString + "/batch", schema)
    val q1 = StreamingIngest.mergeStream(s1, Seq("id"), "merged_state", ckpt1)
    q1.awaitTermination()
    assert(spark.table("global_temp.merged_state").count() == 2)

    // second file: one duplicate key, one new key
    Seq((2L, "DUP"), (3L, "c")).toDF("id", "v")
      .write.mode("append").parquet(dir.toString + "/batch")
    val q2 = StreamingIngest.mergeStream(
      StreamingIngest.readStream(spark, dir.toString + "/batch", schema),
      Seq("id"), "merged_state", ckpt1)
    q2.awaitTermination()
    val state = spark.table("global_temp.merged_state").orderBy("id").collect()
    assert(state.length == 3)
    assert(state(1).getString(1) == "b") // original kept, DUP ignored
  }
}
