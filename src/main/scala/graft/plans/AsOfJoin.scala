package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key (the classic
  * point-in-time enrichment the reference's Postgres would express with
  * a LATERAL subquery).
  *
  * Implemented by composition — union + one window pass — instead of a
  * custom SparkPlan: both sides shuffle ONCE on the key, the union sorts
  * within partitions, and `last(ignoreNulls)` carries the most recent
  * right row forward. O(n log n) per partition, no per-left-row probe,
  * no range-join explosion; survives 100 TB because it is exactly one
  * shuffle + one sort, both on the join key.
  *
  * Right rows are deduplicated to one per (key, time) — keep max id —
  * so ties are deterministic on both engines.
  *
  * The matched right row is carried ATOMICALLY as one struct (not
  * per-column), so a NULL in one payload column of the most-recent right
  * row stays NULL instead of being back-filled from an older row —
  * matching DuckDB ASOF JOIN, which returns the matched row's values,
  * nulls included.
  */
object AsOfJoin {

  /** @param left  (key, leftTimeCol, left payload cols)
    * @param right (key, rightTimeCol, right payload cols)
    * @param direction "backward" (latest right with rightTime <=
    *        leftTime, the default/classic) or "forward" (earliest right
    *        with rightTime >= leftTime — e.g. "next purchase after each
    *        click"). Same one-shuffle one-sort plan either way: forward
    *        just flips the sort order the carry runs over.
    * @return left payload + matched right payload (inner: unmatched left
    *         rows dropped), like DuckDB's `ASOF JOIN`. */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, rightId: String,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightDedup = {
      val w = Window.partitionBy(col(key), col(rightTime))
        .orderBy(col(rightId).desc)
      right.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
    val rightCols = rightDedup.columns.filterNot(_ == key)
    val leftCols = left.columns.filterNot(_ == key)
    val rightStruct = org.apache.spark.sql.types.StructType(
      rightCols.map(c => rightDedup.schema(c)))

    val taggedRight = rightDedup
      .withColumn("_t", col(rightTime)).withColumn("_tag", lit(0))
      .select(Seq(col(key), col("_t"), col("_tag"),
        struct(rightCols.map(col).toIndexedSeq: _*).as("_r")) ++
        leftCols.map(c => lit(null).cast(
          left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left
      .withColumn("_t", col(leftTime)).withColumn("_tag", lit(1))
      .select(Seq(col(key), col("_t"), col("_tag"),
        lit(null).cast(rightStruct).as("_r")) ++ leftCols.map(col): _*)

    // backward: ascending time → "last right seen so far" = latest <=.
    // forward: descending time → "last right seen so far" = earliest >=.
    // Right rows sort before left rows at equal time either way (tag 0 <
    // tag 1), so the boundary is inclusive in both directions.
    val tOrd = if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy(col(key))
      .orderBy(tOrd, col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))

    carried.filter(col("_tag") === 1 && col("_r").isNotNull)
      .select(Seq(col(key)) ++
        rightCols.map(c => col("_r").getField(c).as(c)) ++
        leftCols.map(col): _*)
  }
}
