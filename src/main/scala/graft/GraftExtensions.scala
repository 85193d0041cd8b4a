package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Capwords, DotProduct}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to plain SQL users
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(e.injectFunction)
}

object GraftExtensions {
  private[graft] val descriptors: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("capwords"),
        new ExpressionInfo(classOf[Capwords].getName, "capwords"),
        (exprs: Seq[Expression]) => Capwords(exprs.head)),
      (FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))

  /** Imperative registration for an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
