package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros}
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

  /** Date-bounded events scan with the range predicate applied to the RAW
    * nanos column, BEFORE the timestamp conversion — so it reaches the
    * parquet reader as an int64 min/max filter (row-group pruning /
    * partition pruning at scale). A filter on the converted timestamp
    * cannot be pushed past the conversion expression; this one can.
    * Semantically identical to `to_date(ts) ∈ [start, end]` because nanos
    * in-range ⇔ truncated micros in-range. */
  def eventsBetween(spark: SparkSession, d: String,
                    startDate: String, endDateExclusive: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    def nanosOf(date: String): Long =
      java.time.LocalDate.parse(date).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.getEpochSecond * 1000000000L
    if (raw.schema("ts").dataType == LongType)
      raw.filter(col("ts") >= nanosOf(startDate) &&
          col("ts") < nanosOf(endDateExclusive))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      raw.filter(col("ts") >= lit(startDate).cast("timestamp") &&
        col("ts") < lit(endDateExclusive).cast("timestamp"))
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
