package graft

import graft.vector.{CosineSimilarity, TopKByScore}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's SQL-surface function builders, registered either
  *  - at session build (`.withExtensions(new GraftExtensions)` /
  *    `spark.sql.extensions=graft.GraftExtensions` — the way a library
  *    jar ships Catalyst functions), or
  *  - at runtime into an existing session (`GraftFunctions.register`).
  */
object GraftFunctions {

  val cosineBuilder: Seq[Expression] => Expression =
    exprs => CosineSimilarity(exprs(0), exprs(1))

  val topkBuilder: Seq[Expression] => Expression = exprs => {
    val k = exprs(2).eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"topk_by_score k must be an integer literal, got $other")
    }
    TopKByScore(exprs(0), exprs(1), k).toAggregateExpression()
  }

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", cosineBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("topk_by_score", topkBuilder, "scala_udf")
  }
}

/** Session-build-time injection of the same functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      GraftFunctions.cosineBuilder))
    e.injectFunction((
      FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      GraftFunctions.topkBuilder))
  }
}
