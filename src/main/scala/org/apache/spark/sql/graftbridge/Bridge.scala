package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column↔Expression converters are `private[sql]`; this bridge
  * (placed under the sql package namespace) exposes just the two calls the
  * graft engine needs to lift custom Catalyst expressions into Columns. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
