package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a raw Catalyst [[Expression]] to a public [[Column]].
  *
  * Spark 4 hides the Expression→Column constructor behind
  * `private[sql]`; a shim inside the `org.apache.spark.sql` package
  * tree re-exports it so graft's native expressions can be used as
  * ordinary columns without registering them in a session's function
  * registry (queries must work on any caller-provided SparkSession).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
