package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Native SimHash aggregate: folds token-hash values into `bits` signed
  * counter lanes (bit j of each hash contributes ±1 to lane j) and emits
  * the sign bitmap — one buffer and one tight loop per row instead of
  * `bits` separate SUM aggregate expressions. Same partial-aggregation
  * shape as [[MinHashAgg]]: each partition reduces to one lane vector per
  * group before the shuffle. Output is identical to the declarative
  * 62-column form (ops.Dedup.simhashes pins equality in DedupSpec), so
  * the DuckDB oracle is unaffected. */
case class SimHashAgg(
    child: Expression,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // eval packs lane j into bit j of one long: bits > 62 would silently
  // wrap lane 64 onto bit 0 (1L << 64 == 1L), corrupting signatures
  // with no error; bits < 1 is an empty signature
  require(bits >= 1 && bits <= 62,
    s"SimHashAgg: bits must be in [1, 62], got $bits")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += ((h >>> j) & 1L) * 2L - 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHashAgg = copy(child = c.head)
}

object SimHashAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: SimHash bitmap of grouped long hash values. */
  def simhash(c: Column, bits: Int = 62): Column =
    Bridge.column(
      SimHashAgg(Bridge.expression(c), bits).toAggregateExpression())
}
