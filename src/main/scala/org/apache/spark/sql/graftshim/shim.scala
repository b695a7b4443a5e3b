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
}
