package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

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

  /** Spark SQL's double comparison semantics
    * (`Utils.nanSafeCompareDoubles`, what codegen'd struct ordering
    * uses): NaN ranks greatest, NaN == NaN, and ±0.0 compare equal —
    * NOT `java.lang.Double.compare`, which splits ±0.0. The argmin
    * kernel must tie-break exactly like `array_min` over
    * struct<d, id> or a boundary vector's list assignment could differ
    * between the literal and kernel paths. */
  private def cmpD(a: Double, b: Double): Int = {
    if (a < b) -1
    else if (a > b) 1
    else {
      val na = java.lang.Double.isNaN(a)
      val nb = java.lang.Double.isNaN(b)
      if (na && nb) 0 else if (na) 1 else if (nb) -1 else 0
    }
  }

  /** Argmin over `cents` of the IVF centroid score d = −2·(v·c) + c·c —
    * bit-identical to `array_min(array(struct(dot(v, lit(c))·−2 +
    * lit(cc), id), …))` over the same centroids: same left-to-right dot
    * fold ([[dot]]), same operation order, same nan-safe lexicographic
    * (d, id) tie-break ([[cmpD]]). Returns struct<d: double, id: int>,
    * or NULL when the vector's length differs from the centroid dim.
    * That NULL is an INTENTIONAL divergence from the literal path
    * (ADVICE r16): there, each mismatched dot is NULL, and array_min's
    * nulls-first struct ordering quietly "assigns" the row to the
    * smallest centroid id — a wrong answer with no signal. A dim
    * mismatch is a caller error; the kernel surfaces it as a NULL
    * assignment the downstream count/join makes visible. `cc` is
    * the caller-precomputed Σc², `ids` the centroid ids aligned with
    * `cents` (not assumed sorted — the tie-break handles any order). */
  def argminCentroid(v: ArrayData, cents: Array[Array[Double]],
      cc: Array[Double], ids: Array[Int]): InternalRow = {
    val dim = cents(0).length
    if (v.numElements() != dim) return null
    var bestD = 0.0d
    var bestId = 0
    var first = true
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var acc = 0.0d
      var j = 0
      while (j < dim) {
        acc += v.getDouble(j) * c(j)
        j += 1
      }
      val d = acc * -2.0d + cc(i)
      if (first) { bestD = d; bestId = ids(i); first = false }
      else {
        val cp = cmpD(d, bestD)
        if (cp < 0 || (cp == 0 && ids(i) < bestId)) {
          bestD = d; bestId = ids(i)
        }
      }
      i += 1
    }
    InternalRow(bestD, bestId)
  }

  /** One-pass per-vector int8 quantization → (mn, delta, codes, sq).
    * Bit-compatible with the staged declarative form it fuses (and the
    * DuckDB oracle): min/max via Double.compare (NaN ranks greatest,
    * matching Spark's array_min/array_max ordering), codes =
    * `floor((x − mn) · 255 / (mx − mn))` in exactly that operation
    * order, all-zero codes when mx == mn, sq = Σ codes. Codes are emitted
    * as doubles (exact: values ≤ 255) so the shortlist scan feeds the
    * fused [[dot]] kernel directly. */
  def quantizeInt8(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var mn = v.getDouble(0)
    var mx = mn
    var i = 1
    while (i < n) {
      val x = v.getDouble(i)
      if (java.lang.Double.compare(x, mn) < 0) mn = x
      if (java.lang.Double.compare(x, mx) > 0) mx = x
      i += 1
    }
    val codes = new Array[Double](n)
    var sq = 0L
    // degenerate-range test under SQL equality semantics, not Java's:
    // an all-NaN vector has mn = mx = NaN and Java NaN != NaN is TRUE
    // (NaN codes), while ±0.0 are == under primitives but differ under
    // Double.compare (so compare-based testing emits 0/0 = NaN codes
    // for a mixed-sign all-zero vector). The declarative form
    // (array_max === array_min, NaN- and -0.0-normalized) and the
    // DuckDB oracle's mx = mn treat BOTH cases as equal → zero codes;
    // primitive == plus an explicit both-NaN check reproduces that.
    val degenerate = mx == mn ||
      (java.lang.Double.isNaN(mx) && java.lang.Double.isNaN(mn))
    if (!degenerate) {
      i = 0
      while (i < n) {
        val c = math.floor((v.getDouble(i) - mn) * 255.0d / (mx - mn))
        codes(i) = c
        sq += c.toLong
        i += 1
      }
    }
    InternalRow(mn, (mx - mn) / 255.0d,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes), sq)
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

/** Native fused [[VectorAlgos.quantizeInt8]]: one codegen'd pass per row
  * replaces a three-projection chain of interpreted higher-order
  * functions (cast-transform, code-transform, sum-fold — each an array
  * allocation and an interpreted lambda per element; at corpus scale that
  * per-row cost IS the staging cost). Input ARRAY<DOUBLE> with non-null
  * elements; an EMPTY vector yields NULL (the declarative form's
  * array_min(null) propagation). */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QuantizeInt8.schema
  override def prettyName: String = "quantize_int8"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null
    else VectorAlgos.quantizeInt8(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorAlgos.quantizeInt8($a);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeInt8 = copy(child = newChild)
}

object QuantizeInt8 {
  val schema: StructType = StructType(Seq(
    StructField("mn", DoubleType, nullable = false),
    StructField("delta", DoubleType, nullable = false),
    StructField("codes", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("sq", LongType, nullable = false)))
}

/** Native fused [[VectorAlgos.argminCentroid]] — the IVF assignment
  * kernel (VERDICT r15 #3). The literal form (`array_min` over an
  * `array()` of nlist scored structs) inlines every centroid component
  * into the expression tree: at production quantizer sizes (nlist
  * 4k–64k × dim 128–1024) that is tens of thousands of expression nodes
  * per column — analysis chokes and codegen's method-size splitter
  * falls the stage back to interpreted rows long before the executors
  * see data. Here the centroids ride as ONE plan-referenced object
  * (`ctx.addReferenceObj` — serialized once per stage, zero analysis
  * footprint, same mechanism broadcast hash maps use), the per-row work
  * is a primitive double[][] loop, and the expression stays inside
  * WholeStageCodegen at any nlist (plan-pinned in IvfSpec). Bit-identical
  * to the literal form by construction — see [[VectorAlgos.argminCentroid]].
  *
  * Equality/canonicalization note: the centroid arrays participate by
  * REFERENCE, so two semantically-equal kernels built from equal
  * centroid values are not `semanticEquals` — harmless here (the plan
  * builds each kernel once and subexpression elimination still works
  * within a projection via the common reference). */
case class CentroidArgmin(child: Expression,
    centroids: Array[Array[Double]], ids: Array[Int])
    extends UnaryExpression {
  require(centroids.nonEmpty && centroids.length == ids.length,
    "CentroidArgmin: need ≥1 centroid and aligned ids")

  /** Σc² per centroid — the SAME driver-side fold the literal path bakes
    * into `lit(c.map(x => x*x).sum)` (left-to-right over the components). */
  private lazy val cc: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum)

  override def dataType: DataType = CentroidArgmin.schema
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_argmin"

  override protected def nullSafeEval(v: Any): Any =
    VectorAlgos.argminCentroid(
      v.asInstanceOf[ArrayData], centroids, cc, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centroids, "double[][]")
    val ccRef = ctx.addReferenceObj("cc", cc, "double[]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.VectorAlgos.argminCentroid(
         |  $v, $centsRef, $ccRef, $idsRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidArgmin = copy(child = newChild)
}

object CentroidArgmin {
  val schema: StructType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("id", org.apache.spark.sql.types.IntegerType,
      nullable = false)))
}
