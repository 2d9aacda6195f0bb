package graft.streaming

import graft.dims.CoalesceMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming mode of the engine (SURVEY.md §7.5): the
  * reference's daily Map-over-dates fan-out becomes a file-source stream;
  * the A4 insert-if-absent merge becomes a `foreachBatch` upsert. No
  * watermark semantics exist in the reference (batch-only), so the
  * streaming surface is: windowed aggregation with a watermark for the
  * serving counters, and idempotent per-batch merges for the warehouse.
  */
object StreamingIngest {

  /** File-source stream over a directory of staged parquet. */
  def readStream(spark: SparkSession, dir: String, schema: StructType,
                 globFilter: String = "*.parquet"): DataFrame =
    spark.readStream.schema(schema)
      .option("pathGlobFilter", globFilter)
      .parquet(dir)

  /** Streaming form of [[graft.Tables.events]]: the events parquet stores
    * `ts` as TIMESTAMP(NANOS), so the stream reads it as a raw long
    * (`nanosAsLong`) and truncates to a microsecond timestamp. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.option("pathGlobFilter", "events.parquet")
      .parquet(dir).schema
    val raw = readStream(spark, dir, schema, globFilter = "events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Tumbling-window event counts with a watermark (the streaming form
    * of A-agg3 per-date counts). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** foreachBatch insert-if-absent merge into an accumulating in-memory
    * view — the streaming form of the A4 event merge. Each micro-batch
    * is deduplicated and anti-joined against the accumulated state, so
    * replays are idempotent (exactly the property the reference buys
    * with `ON CONFLICT DO NOTHING`). */
  def mergeStream(stream: DataFrame, keys: Seq[String], stateView: String,
                  checkpoint: String): StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch runs in a cloned session — a plain temp view would
        // be invisible to the caller, so accumulate in a global temp view
        val spark = batch.sparkSession
        val prev =
          if (spark.catalog.tableExists("global_temp", stateView))
            spark.table(s"global_temp.$stateView")
          else batch.limit(0)
        val merged = CoalesceMerge.insertIfAbsent(prev, batch, keys)
        merged.cache().count() // materialize before replacing the view
        merged.createOrReplaceGlobalTempView(stateView)
      }
      .start()
  }
}
