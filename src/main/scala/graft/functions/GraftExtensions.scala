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
    // poly_hash(str[, base, mod]) — optional base/mod literals so SQL
    // users can reproduce any of the engine's hash families
    ("poly_hash",
      new ExpressionInfo(classOf[GraftExtensions].getName, "poly_hash"),
      { args =>
        require(args.nonEmpty && args.length <= 3,
          "poly_hash expects 1-3 arguments")
        PolyHash(args.head,
          base = longLit(args, 1, "poly_hash").getOrElse(31L),
          mod = longLit(args, 2, "poly_hash").getOrElse(2147483647L))
      }),
    expr1("poly_hash2", PolyHash2),
    expr2("vec_dot", DotProduct),
    // winnow_fps(str[, k, w]) — MOSS winnowing fingerprint selection
    // (ARRAY<LONG>), defaults k=4 w=5 like ops.TextAnalysis.winnow
    ("winnow_fps",
      new ExpressionInfo(classOf[GraftExtensions].getName, "winnow_fps"),
      { args =>
        require(args.nonEmpty && args.length <= 3,
          "winnow_fps expects 1-3 arguments")
        WinnowFps(args.head,
          k = intLit(args, 1, "winnow_fps").getOrElse(4),
          w = intLit(args, 2, "winnow_fps").getOrElse(5))
      }),
  )

  /** [[longLit]] narrowed to Int range — a bare `.toInt` would TRUNCATE
    * an over-range long (4294967301 → 5) before any k/w ≥ 1 guard could
    * see it, silently changing the requested parameter. */
  private def intLit(args: Seq[Expression], i: Int,
      fn: String): Option[Int] =
    longLit(args, i, fn).map { n =>
      require(n >= 1L && n <= Int.MaxValue.toLong,
        s"$fn integer arguments must be in [1, ${Int.MaxValue}], got $n")
      n.toInt
    }

  /** Fold the i-th optional argument to an integer literal. */
  private def longLit(args: Seq[Expression], i: Int,
      fn: String): Option[Long] =
    args.lift(i).map(_.eval(null) match {
      case n: Long => n
      case n: Int => n.toLong
      case other => throw new IllegalArgumentException(
        s"$fn optional arguments must be integer literals, got $other")
    })

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
