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

  /** Set-membership filter built DIRECTLY as Catalyst's `InSet` — ONE
    * expression node carrying the set — instead of `Column.isin`,
    * whose `In` holds one Literal CHILD per value: every
    * analyzer/optimizer pass walks all of them, measured at ~0.5 ms
    * per literal (a 80k-key probe made planning 25× slower than the
    * scan it was pruning). InSet is what OptimizeIn folds In into
    * anyway; building it up front keeps planning O(1) in the value
    * count, and the parquet pushdown translates InSet the same as In.
    * Values are converted to their INTERNAL forms (UTF8String for
    * strings) — InSet compares against internal row values; already-
    * internal values pass through. */
  def inSet(c: Column, values: Iterable[Any]): Column =
    if (values.isEmpty) org.apache.spark.sql.functions.lit(false)
    else column(org.apache.spark.sql.catalyst.expressions.InSet(
      expression(c),
      values.map {
        case s: String =>
          org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case v => v
      }.toSet))

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
