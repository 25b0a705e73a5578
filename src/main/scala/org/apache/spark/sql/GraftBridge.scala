package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic-API Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (org.apache.spark.sql.classic.ExpressionUtils).
  * Lives in the sql package solely to re-export the two converters needed
  * to expose custom Catalyst expressions as user-facing Columns — the
  * standard technique for out-of-tree Spark extensions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame (classic API). */
  def plan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame (classic Dataset.ofRows). */
  def dataFrame(
      spark: SparkSession,
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], p)

  /** Register a native expression as a SQL function on a LIVE session
    * (SparkSessionExtensions only applies at session build time).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
