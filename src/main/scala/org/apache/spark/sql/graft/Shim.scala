package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression and
  * LogicalPlan↔DataFrame converters — the supported way for an extension
  * library to lift a custom Catalyst `Expression` / `LogicalPlan` into the
  * public API without a function registry. (This package placement is the
  * standard Spark-extension idiom; nothing else in the codebase reaches
  * into Spark internals.) */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** The session planner's FULL strategy list (builtin + extension-injected
    * + experimental) — for idempotence checks before registering one. */
  def plannerStrategies(spark: SparkSession): Seq[Any] =
    spark.asInstanceOf[classic.SparkSession].sessionState.planner.strategies
}
