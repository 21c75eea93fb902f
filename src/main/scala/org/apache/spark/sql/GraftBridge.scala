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
}
