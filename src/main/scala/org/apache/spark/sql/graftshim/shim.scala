package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` API: wrap/unwrap a Catalyst
  * `Expression` as a public `Column`. This is the one sanctioned seam a
  * library needs to expose native expressions through the Column API
  * (everything else in graft uses only public Spark surface). */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an analyzed logical plan as a DataFrame — used by the registry
    * ORDER-BY-totality audit to evaluate a query's Sort input (keys +
    * full rows) without re-deriving the plan by hand. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
