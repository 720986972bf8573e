package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal accessors for two `private[sql]` seams an extension library
  * needs: materializing a DataFrame over a custom LogicalPlan
  * (`Dataset.ofRows`) and injecting a planner strategy at runtime
  * (`experimental.extraStrategies`). Lives under `org.apache.spark.sql`
  * only to satisfy the access qualifier; contains no engine logic.
  */
object GraftBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column → catalyst Expression (pre-analysis tree; `private[sql]` in
    * Spark 4's column-node API, hence bridged here). Converts EAGERLY via
    * the classic converter — `ExpressionUtils.expression` would wrap the
    * column-node tree in one opaque lazy leaf, invisible to tree traversal.
    */
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** catalyst Expression → Column (inverse of [[expression]]). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy)) {
        exp.extraStrategies = exp.extraStrategies :+ strategy
      }
    }
  }
}
