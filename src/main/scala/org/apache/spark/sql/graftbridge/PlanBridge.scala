package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Re-exposes the two `private[sql]` DataFrame<->LogicalPlan converters a
  * library needs to offer a custom operator as a DataFrame-in,
  * DataFrame-out API (the analyzed plan of the inputs, and
  * `Dataset.ofRows` to wrap the composed plan back up). */
object PlanBridge {
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
