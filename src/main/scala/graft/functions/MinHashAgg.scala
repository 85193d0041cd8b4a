package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst aggregate computing a k-wide MinHash signature in ONE
  * aggregation pass: the buffer is a primitive long[k] of running minima of
  * h_i(x) = (aᵢ·x + bᵢ) mod P over the input hash values.
  *
  * `TypedImperativeAggregate` gives partial aggregation for free: each
  * partition reduces to one k-vector, merge takes element-wise minima, so
  * the shuffle carries one signature per group per partition — the same
  * scale shape as the 64-column declarative form in ops.Dedup, with a
  * single buffer instead of k aggregate expressions.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    seed: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // k <= 0 only fails later and opaquely (serialize allocates 8*k bytes)
  require(k >= 1, s"MinHashAgg: k must be >= 1, got $k")

  private val P = 2147483647L

  // deterministic (a, b) coefficient pairs — same LCG family as ops.Dedup
  private lazy val coeffs: Array[(Long, Long)] = {
    var state = seed
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 33) % (P - 1) + 1
    }
    Array.fill(k)((next(), next()))
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long] % P
      val xp = if (x < 0) x + P else x
      var i = 0
      while (i < k) {
        val (a, b) = coeffs(i)
        val h = (a * xp + b) % P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
}

object MinHashAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: minhash signature of grouped long hash values. */
  def minhash(c: Column, k: Int = 64, seed: Long = 7L): Column =
    Bridge.column(
      MinHashAgg(Bridge.expression(c), k, seed).toAggregateExpression())
}
