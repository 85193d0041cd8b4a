package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String algorithms the reference relies on that Spark lacks as built-ins.
  * Static methods so generated code can call them directly (whole-stage
  * codegen keeps working — no Scala-closure UDF in the hot path). */
object StringAlgos {

  /** Python `string.capwords(s)` semantics (parse_clean_and_csv.py:315):
    * split on whitespace runs, capitalize each word (first char upper, rest
    * lower), join with single spaces. Differs from Spark's `initcap`, which
    * also splits on non-alphanumerics ("d'aguilar" → initcap "D'Aguilar" vs
    * capwords "D'aguilar"). */
  def capwords(s: UTF8String): UTF8String = {
    if (s == null) return null
    // (?U) = UNICODE_CHARACTER_CLASS: python str.split() treats unicode
    // whitespace (e.g. U+3000 ideographic space) as separators; Java's
    // default \s does not.
    val words = s.toString.split("(?U)\\s+")
    val sb = new StringBuilder(s.numChars())
    var first = true
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        if (!first) sb.append(' ')
        sb.append(w.substring(0, 1).toUpperCase(Locale.ROOT))
        if (w.length > 1) sb.append(w.substring(1).toLowerCase(Locale.ROOT))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native Catalyst expression for [[StringAlgos.capwords]]: null-safe,
  * codegen'd as a static call so it stays inside WholeStageCodegen spans. */
case class Capwords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "capwords"

  override protected def nullSafeEval(input: Any): Any =
    StringAlgos.capwords(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringAlgos.capwords($c)")

  override protected def withNewChildInternal(newChild: Expression): Capwords =
    copy(child = newChild)
}

object GraftFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Wrap a Catalyst expression as a Column (Spark 4 classic API). */
  def asColumn(e: Expression): Column = Bridge.column(e)
  def toExpr(c: Column): Expression = Bridge.expression(c)

  /** Column-level capwords. */
  def capwords(c: Column): Column = asColumn(Capwords(toExpr(c)))
}
