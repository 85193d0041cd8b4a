package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared bit math for the bloom build aggregate and the membership probe
  * expression. Static methods so generated code can call them directly.
  *
  * Probes use classic double hashing: two independent 32-bit lanes from one
  * splitmix64 finalizer over the key, bit_j = (h1 + j·h2) mod bits. The
  * false-positive rate at k probes and m bits over n keys is the textbook
  * (1 - e^{-kn/m})^k — callers size `bits` for their small side; false
  * positives are removed by the exact semi join that follows, so the
  * filter only ever PRUNES work, never changes results.
  */
object BloomAlgos {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def set(words: Array[Long], key: Long, bits: Int, k: Int): Unit = {
    val h = mix(key)
    val h1 = (h & 0xffffffffL).toInt
    val h2 = ((h >>> 32) | 1L).toInt // odd → cycles through all residues
    var j = 0
    while (j < k) {
      val bit = java.lang.Integer.remainderUnsigned(h1 + j * h2, bits)
      words(bit >>> 6) |= (1L << (bit & 63))
      j += 1
    }
  }

  def contains(key: Long, words: Array[Long], bits: Int, k: Int): Boolean = {
    val h = mix(key)
    val h1 = (h & 0xffffffffL).toInt
    val h2 = ((h >>> 32) | 1L).toInt
    var j = 0
    while (j < k) {
      val bit = java.lang.Integer.remainderUnsigned(h1 + j * h2, bits)
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      j += 1
    }
    true
  }
}

/** Native Catalyst aggregate building a bloom bitmap over grouped LONG keys
  * in ONE pass: the buffer is a primitive long[bits/64] word array; update
  * sets k probe bits, merge is a word-wise OR. Partial aggregation comes
  * free from `TypedImperativeAggregate`, so each map task reduces its slice
  * to one bitmap and the shuffle carries bitmaps, not keys — the build side
  * of a join-pruning filter at any scale. The evaluated bitmap is small
  * driver metadata (bits/8 bytes), like a broadcast dim or IVF centroids.
  */
case class BloomAgg(
    child: Expression,
    bits: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits % 64 == 0 && bits > 0, "bits must be a positive multiple of 64")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomAlgos.set(buf, v.asInstanceOf[Long], bits, k)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits / 64)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomAgg = copy(child = c.head)
}

/** Native membership probe against a driver-built bloom bitmap. The bitmap
  * rides the plan as a reference object (it is kilobytes — the same scale
  * as a broadcast hash table's metadata), and the probe stays inside
  * WholeStageCodegen via a static call, so pruning a 100 TB scan costs a
  * few arithmetic ops per row before the shuffle it avoids. */
case class BloomContains(child: Expression, words: Array[Long], bits: Int,
    k: Int) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(input: Any): Any =
    BloomAlgos.contains(input.asInstanceOf[Long], words, bits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomAlgos.contains($c, $ref, $bits, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: one-row bloom bitmap (ARRAY<LONG>) over grouped keys. */
  def bloomAgg(c: Column, bits: Int, k: Int): Column =
    Bridge.column(BloomAgg(Bridge.expression(c), bits, k).toAggregateExpression())

  /** Column API: probe a driver-held bitmap. */
  def mightContain(c: Column, words: Array[Long], bits: Int, k: Int): Column =
    Bridge.column(BloomContains(Bridge.expression(c), words, bits, k))
}
