package graft.dims

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history from a change-event stream.
  *
  * The reference keeps dimensions current-state-only (loader upserts,
  * `loader/service.py` update paths overwrite in place), which loses
  * history. This is the standard warehouse complement: collapse a
  * key-ordered change stream into versioned rows with
  * `[valid_from, valid_to)` intervals and an `is_current` flag, so a
  * point-in-time join (`plans.AsOfJoin`, or a range predicate against
  * the interval) can reconstruct any past state.
  *
  * Scale shape: ONE hash shuffle on the entity key; both window passes
  * (change-collapse lag, then interval lead) and the intervening filter
  * share that partitioning and (ts, tie) sort, so EnsureRequirements
  * plans a single exchange + a single sort — no per-entity collect, no
  * driver state. At 100 TB the cost is the one shuffle of the change
  * stream, which is the information-theoretic floor for key-ordered
  * history building.
  */
object Scd2 {

  /** Collapse a change stream into SCD2 interval rows.
    *
    * @param keyCols  entity key (partition of the history)
    * @param tsCol    change timestamp (interval boundaries)
    * @param tieCol   unique tiebreaker for a deterministic order under
    *                 equal timestamps (e.g. the event id)
    * @param attrCols tracked attributes: consecutive rows with equal
    *                 attribute tuples merge into one version
    */
  def fromChanges(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  tieCol: String, attrCols: Seq[String]): DataFrame = {
    val reserved = Seq("_prev", "valid_from", "valid_to", "is_current")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input columns collide with SCD2 output/temp names: ${reserved.mkString(",")}")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    // change detection: keep the FIRST row of each run of equal attribute
    // tuples (null-safe so a null attribute doesn't open a new version
    // per row)
    val changes = df
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(col("_prev").isNull || !(col("_prev") <=> attrs))
      .drop("_prev")
    // interval assembly over the filtered stream: same partitioning and
    // sort order as above, so no second exchange is planned
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
