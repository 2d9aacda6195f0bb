package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column a thin wrapper over ColumnNode and gated the
  * Expression<->Column converters behind `private[sql]`. This bridge
  * lives in an `org.apache.spark.sql` subpackage purely to re-expose the
  * two converters to the graft engine's custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a fully-built Catalyst Expression via
    * the ACTIVE session's ColumnNode converter. `expression` above wraps
    * the node in a lazy `ColumnNodeExpression`, which only the Dataset
    * API's analysis path unwraps — an expression returned from a
    * FunctionRegistry builder never goes through that path and would hit
    * codegen unresolved. Function builders must use this variant. */
  def resolvedExpression(c: Column): Expression = {
    val spark = org.apache.spark.sql.SparkSession.getActiveSession
      .getOrElse(throw new IllegalStateException(
        "no active SparkSession to resolve a Column-built SQL function"))
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.expression(c)
  }
}
