package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels for the similarity operators.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is codegen'd but materializes the zipped products as an intermediate
  * array per row-pair; in the ANN re-rank loops that allocation dominates.
  * This static kernel is called straight from generated code (one fused
  * loop, no allocation) and accumulates LEFT-TO-RIGHT in double, which
  * keeps it bit-identical to both the old expression and the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, list_transform(...)))` replay.
  */
object VectorAlgos {

  /** Σ aᵢ·bᵢ over two equal-length double arrays (left-to-right fold).
    * PRECONDITION: equal lengths and non-null elements (the caller checks
    * lengths; embedding columns are containsNull-free after the toDouble
    * cast). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Native Catalyst expression for [[VectorAlgos.dot]]: null-safe, stays
  * inside WholeStageCodegen spans via a static call. Inputs must be
  * ARRAY<DOUBLE> with non-null elements (cast float vectors up front —
  * Similarity.toDouble). Length-mismatched inputs yield NULL — the same
  * contract as the declarative zip_with form it replaced, which null-pads
  * the shorter side and so propagates null through the sum. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else VectorAlgos.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorAlgos.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
