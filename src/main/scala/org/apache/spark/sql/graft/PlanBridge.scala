package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge from a raw Catalyst [[LogicalPlan]] to a public DataFrame —
  * the `Dataset.ofRows` constructor is `private[sql]` in Spark 4, so
  * graft's custom logical operators re-export it from inside the
  * package tree (same pattern as [[ColumnBridge]]).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan behind `df` (`Dataset.logicalPlan` is
    * `private[sql]`) — lets a caller rebind a DataFrame to another
    * session of the same SparkContext via [[ofRows]].
    */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** The session's stable UUID (`sessionUUID` is `private[sql]`) —
    * the correct per-session cache-key component: identityHashCode is
    * not unique across GC'd/recreated sessions. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
