package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score DOUBLE, id LONG) pairs: keeps the k
  * highest-scoring entries per group, ties broken by LOWER id (matching
  * `ORDER BY score DESC, id` row_number semantics).
  *
  * This replaces the rank-window pattern
  * `row_number().over(Window.partitionBy(g).orderBy(desc(score), id)) <= k`
  * in the ANN re-rank loops. The window shuffles and SORTS every candidate
  * row inside each group; this aggregate is a partial-aggregating
  * `TypedImperativeAggregate`, so each map task reduces its slice to ≤ k
  * entries before the shuffle — the classic scale shape for top-k (only
  * k·partitions rows move, nothing is globally sorted).
  *
  * Buffer: two parallel arrays in insertion-sorted order (descending score,
  * ascending id). k is small (≤ tens) in the ANN paths, so O(k) insertion
  * beats heap constant factors.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  import TopKAgg.Buffer

  // k = 0 indexes scores(-1) inside a task (opaque executor AIOOBE)
  require(k >= 1, s"TopKAgg: k must be >= 1, got $k")

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var j = 0
    while (j < other.size) {
      buf.insert(other.scores(j), other.ids(j))
      j += 1
    }
    buf
  }

  /** ARRAY<STRUCT<score DOUBLE, id LONG>> in rank order. */
  override def eval(buf: Buffer): Any = {
    val rows: Array[Any] = Array.tabulate(buf.size) { j =>
      InternalRow(buf.scores(j), buf.ids(j))
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buffer(k)
    var j = 0
    while (j < n) { buf.append(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "top_k_by"

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg =
    copy(score = c(0), id = c(1))
}

/** [[TopKAgg]] with a carried ARRAY<DOUBLE> payload per entry (the
  * candidate's vector): keeps the k highest-scoring (score, id, vec)
  * triples per group, same ordering contract as TopKAgg.
  *
  * This is the single-pass ANN shape: when the scan that scores candidates
  * is already streaming the row that holds the true vector, carrying the
  * vector through the bounded aggregate costs no extra IO and saves the
  * re-rank phase a second corpus scan + broadcast join — the buffer holds
  * at most k vectors per group (k · dim · 8 bytes, driver-safe), and map
  * tasks still reduce their slice to ≤ k entries before the shuffle. */
case class TopKVecAgg(
    score: Expression,
    id: Expression,
    vec: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKVecAgg.Buffer] {

  import TopKVecAgg.Buffer

  require(k >= 1, s"TopKVecAgg: k must be >= 1, got $k")

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    val v = vec.eval(input)
    if (s != null && i != null && v != null)
      // toDoubleArray COPIES out of the (possibly reused) scan row buffer
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long],
        v.asInstanceOf[ArrayData].toDoubleArray())
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    var j = 0
    while (j < other.size) {
      buf.insert(other.scores(j), other.ids(j), other.vecs(j))
      j += 1
    }
    buf
  }

  /** ARRAY<STRUCT<score DOUBLE, id LONG, vec ARRAY<DOUBLE>>> in rank
    * order. */
  override def eval(buf: Buffer): Any = {
    val rows: Array[Any] = Array.tabulate(buf.size) { j =>
      InternalRow(buf.scores(j), buf.ids(j), new GenericArrayData(buf.vecs(j)))
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    var bytes = 8
    var j = 0
    while (j < buf.size) { bytes += 20 + 8 * buf.vecs(j).length; j += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    bb.putInt(0) // reserved
    j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j))
      val v = buf.vecs(j)
      bb.putInt(v.length)
      var d = 0
      while (d < v.length) { bb.putDouble(v(d)); d += 1 }
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    bb.getInt // reserved
    val buf = new Buffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble; val i = bb.getLong
      val v = new Array[Double](bb.getInt)
      var d = 0
      while (d < v.length) { v(d) = bb.getDouble; d += 1 }
      buf.append(s, i, v)
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = false),
        nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id, vec)
  override def prettyName: String = "top_k_by_vec"

  override def withNewMutableAggBufferOffset(o: Int): TopKVecAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKVecAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKVecAgg =
    copy(score = c(0), id = c(1), vec = c(2))
}

object TopKVecAgg {

  /** Sorted bounded buffer: TopKAgg.Buffer plus a parallel payload
    * array. CONTRACT COUPLING: the ordering rule (Double.compare —
    * NaN ranks first — with ascending-id tie-break) is duplicated from
    * [[TopKAgg.Buffer]] because the payload array must shift in the
    * same insertion pass; any comparator change there MUST land here in
    * the same commit (the NaN rationale lives on TopKAgg.Buffer). */
  final class Buffer(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    val vecs = new Array[Array[Double]](k)
    var size: Int = 0

    @inline private def beats(s: Double, i: Long, j: Int): Boolean = {
      val c = java.lang.Double.compare(s, scores(j))
      c > 0 || (c == 0 && i < ids(j))
    }

    def append(s: Double, i: Long, v: Array[Double]): Unit = {
      scores(size) = s; ids(size) = i; vecs(size) = v; size += 1
    }

    def insert(s: Double, i: Long, v: Array[Double]): Unit = {
      if (size == k && !beats(s, i, k - 1)) return
      var pos = if (size == k) k - 1 else size
      while (pos > 0 && beats(s, i, pos - 1)) pos -= 1
      if (size < k) size += 1
      var j = size - 1
      while (j > pos) {
        scores(j) = scores(j - 1); ids(j) = ids(j - 1); vecs(j) = vecs(j - 1)
        j -= 1
      }
      scores(pos) = s
      ids(pos) = i
      vecs(pos) = v
    }
  }

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: top-k (score, id, vec) entries per group in rank order. */
  def topKByVec(score: Column, id: Column, vec: Column, k: Int): Column =
    Bridge.column(
      TopKVecAgg(Bridge.expression(score), Bridge.expression(id),
        Bridge.expression(vec), k).toAggregateExpression())
}

object TopKAgg {

  /** Sorted bounded buffer (descending score, ascending id on ties). */
  final class Buffer(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    // total order via Double.compare — NaN greatest, -0.0 < 0.0 — so a NaN
    // score (zero-norm vector → NaN cosine) ranks FIRST, exactly like the
    // desc row_number window this aggregate replaces; primitive > would
    // silently drop NaN entries instead
    @inline private def beats(s: Double, i: Long, j: Int): Boolean = {
      val c = java.lang.Double.compare(s, scores(j))
      c > 0 || (c == 0 && i < ids(j))
    }

    /** Append without ordering checks (deserialization of sorted data). */
    def append(s: Double, i: Long): Unit = {
      scores(size) = s; ids(size) = i; size += 1
    }

    def insert(s: Double, i: Long): Unit = {
      if (size == k && !beats(s, i, k - 1)) return
      // find insertion point (k is small; linear from the tail)
      var pos = if (size == k) k - 1 else size
      while (pos > 0 && beats(s, i, pos - 1)) pos -= 1
      if (size < k) size += 1
      var j = size - 1
      while (j > pos) {
        scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1
      }
      scores(pos) = s
      ids(pos) = i
    }
  }

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: top-k (score, id) entries per group in rank order. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
