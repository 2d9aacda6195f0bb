package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All engine queries take the scale-factor directory as a parameter and
  * read the parquet directly — schemas are fixed by the driver, so we do
  * NOT infer-on-read anything beyond parquet's own footer schema. Filters
  * and projections applied downstream are pushed into these scans by
  * Catalyst (verify via `.explain("formatted")`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** The `events` parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright. Read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to a proper
    * microsecond TimestampType column — the same floor-division DuckDB
    * applies, so oracle comparisons agree. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
