package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Capwords

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to plain SQL users
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.capwordsDescriptor)
  }
}

object GraftExtensions {
  private[graft] val capwordsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("capwords"),
      new ExpressionInfo(classOf[Capwords].getName, "capwords"),
      (exprs: Seq[Expression]) => Capwords(exprs.head))

  /** Imperative registration for an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = capwordsDescriptor
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }
}
