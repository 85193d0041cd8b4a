package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Capwords, DotProduct, NfcNormalize, PolyHash, PolyHash2}

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
        (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))),
      // poly_hash(s[, base, mod]) — the engine-portable polynomial hash,
      // so SQL users can reproduce signatures/splits from plain SQL
      (FunctionIdentifier("poly_hash"),
        new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
        (exprs: Seq[Expression]) => PolyHash(exprs.head,
          base = exprs.lift(1).map(foldToLong).getOrElse(31L),
          mod = exprs.lift(2).map(foldToLong).getOrElse(2147483647L))),
      (FunctionIdentifier("poly_hash2"),
        new ExpressionInfo(classOf[PolyHash2].getName, "poly_hash2"),
        (exprs: Seq[Expression]) => PolyHash2(exprs.head)),
      // nfc_normalize(s) — Unicode canonical composition, same name and
      // semantics as DuckDB's built-in
      (FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
        (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))

  private def foldToLong(e: Expression): Long =
    e.eval(null) match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(
        s"poly_hash base/mod must be integer literals, got $other")
    }

  /** Imperative registration for an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
