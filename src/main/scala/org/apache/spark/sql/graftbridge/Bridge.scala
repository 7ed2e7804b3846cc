package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: Column ⇄ catalyst Expression conversions are
  * `private[sql]` in Spark 4, so third-party expressions (graft.functions)
  * reach them through this one sub-package object — the standard pattern
  * for out-of-tree Catalyst extensions. Nothing else from the private API
  * surface is used. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
