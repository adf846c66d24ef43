package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Expression<->Column converters (Spark 4
  * removed the public `new Column(expr)` constructor when the API split
  * for Connect). Standard extension-library technique: a tiny object in
  * the org.apache.spark.sql package exposing exactly the two calls the
  * engine's native expressions need. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
