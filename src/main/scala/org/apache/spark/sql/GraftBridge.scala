package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's package-private Column <-> Expression conversions.
  * Spark 4 decoupled the public Column API from Catalyst; libraries that
  * define native expressions use a shim in org.apache.spark.sql to reach
  * the classic converter (the same access pattern Spark's own connectors
  * use). Kept to exactly these two calls. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime function registration on a live session (builder-time
    * extensions don't apply when getOrCreate returns an existing session). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
