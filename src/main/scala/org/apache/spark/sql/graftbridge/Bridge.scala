package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column↔Expression converters are `private[sql]`; this bridge
  * (placed under the sql package namespace) exposes just the calls the
  * graft engine needs to lift custom Catalyst expressions into Columns and
  * to re-plan over a cached relation. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The internal RDD behind a localCheckpoint'd DataFrame (its plan is a
    * LogicalRDD leaf). Iterative algorithms checkpoint every round to keep
    * plans constant-size; this handle lets them unpersist round r−1's
    * checkpoint blocks DETERMINISTICALLY once round r is materialized,
    * instead of waiting for the ContextCleaner's GC-driven reclaim. */
  def internalRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
}
