package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); extension libraries
  * conventionally expose them through a shim in the sql package — this is
  * the standard pattern used by Spark connector/extension projects.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
