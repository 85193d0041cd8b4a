package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native expressions: a user who writes
  * `spark.sql(...)` instead of the Column API gets the same codegen'd
  * kernels by name.
  *
  * Two ways in:
  *  - at session build: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`), the standard plugin
  *    seam for clusters where the session is constructed by the platform.
  *  - on a live session: [[GraftExtensions.register]] — notebooks.
  *
  * Signatures:
  *  - `capwords(str)` — python string.capwords semantics (C1)
  *  - `nfc_normalize(str)` — Unicode NFC composition
  *  - `poly_hash(str)` — the portable 31/2³¹−1 polynomial hash every
  *    deterministic sampling/sharding op keys on
  *  - `poly_hash2(str)` — the 62-bit dual-polynomial variant
  *  - `vec_dot(a, b)` — fused left-to-right double dot product
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def expr1(name: String, f: Expression => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, new ExpressionInfo(classOf[GraftExtensions].getName, name),
      { args =>
        require(args.length == 1, s"$name expects 1 argument")
        f(args.head)
      })

  private def expr2(name: String,
      f: (Expression, Expression) => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, new ExpressionInfo(classOf[GraftExtensions].getName, name),
      { args =>
        require(args.length == 2, s"$name expects 2 arguments")
        f(args.head, args(1))
      })

  /** (name, info, builder) for every native function. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    expr1("capwords", Capwords),
    expr1("nfc_normalize", NfcNormalize),
    expr1("poly_hash", PolyHash(_, 31L, 2147483647L)),
    expr1("poly_hash2", PolyHash2),
    expr2("vec_dot", DotProduct),
  )

  /** Register on an already-built session (notebook path). Idempotent —
    * re-registration replaces the same names. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }

  /** The names this module claims (spec: none may collide with Spark
    * built-ins). */
  def names: Seq[String] = functions.map(_._1)

  /** True iff `name` would shadow a Spark built-in. */
  def shadowsBuiltin(name: String): Boolean =
    FunctionRegistry.builtin.functionExists(FunctionIdentifier(name))
}
