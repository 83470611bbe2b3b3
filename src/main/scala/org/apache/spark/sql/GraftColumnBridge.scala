package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters of
  * the classic Spark SQL runtime (`org.apache.spark.sql.classic.
  * ExpressionUtils`), so graft's native Catalyst expressions can be
  * exposed as user-facing Columns. This is the standard extension-library
  * technique (a one-object shim in the spark.sql package). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
