package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Primitive candidate buffer for [[TopKNbrAgg]]: parallel arrays sorted
  * by (cos desc, id asc), `len` live entries. No per-entry objects — the
  * buffer mutates in place and only grows (rarely) by doubling.
  */
final class TopKBuf(var cos: Array[Double], var ids: Array[Long], var len: Int) {
  def ensure(capacity: Int): Unit = if (cos.length < capacity) {
    val n = math.max(capacity, cos.length * 2)
    cos = java.util.Arrays.copyOf(cos, n)
    ids = java.util.Arrays.copyOf(ids, n)
  }
}

/** Native Catalyst top-k-neighbors aggregate over (cosine, id) input rows
  * — the [[TypedImperativeAggregate]] counterpart of a udaf-wrapped
  * Dataset Aggregator, with two hot-path wins: `update` reads the input
  * columns straight off the `InternalRow` (no per-row tuple
  * deserialization or boxing), and the buffer is a pair of primitive
  * arrays mutated in place (no immutable-List churn). Planned inside
  * ObjectHashAggregate, so map-side partial aggregation still cuts the
  * O(n²) pair stream to ~k rows per group before the exchange.
  *
  * Ordering runs on UNROUNDED cosines with an ε-slack candidate window
  * (|round(x,8) − x| ≤ 5e-9, so anything trailing the k-th best by more
  * than 2e-8 can never enter the rounded top-k, and > k entries at one
  * exact cosine rank by id); `eval` applies Spark's exact round-8
  * (BigDecimal.valueOf → HALF_UP) once per survivor and emits the final
  * rounded-ordered top-k as array<struct<_1 double, _2 bigint>>.
  */
case class TopKNbrAgg(
    cosChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  private val Eps = 2e-8

  override def left: Expression = cosChild
  override def right: Expression = idChild
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("_1", DoubleType, nullable = false),
      StructField("_2", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuf =
    new TopKBuf(new Array[Double](k + 4), new Array[Long](k + 4), 0)

  /** a before b in the (cos desc, id asc) candidate order. */
  private def before(c1: Double, i1: Long, c2: Double, i2: Long): Boolean =
    c1 > c2 || (c1 == c2 && i1 < i2)

  /** In-place prune: drop entries trailing the k-th best by > Eps and cap
    * exact-cosine tie runs at k entries (excess ties lose by id in the
    * final order regardless).
    */
  private def prune(buf: TopKBuf): Unit = {
    if (buf.len <= k) return
    val kth = buf.cos(k - 1)
    var w = 0
    var runCos = Double.NaN
    var runLen = 0
    var r = 0
    while (r < buf.len && buf.cos(r) >= kth - Eps) {
      if (buf.cos(r) == runCos) runLen += 1 else { runCos = buf.cos(r); runLen = 1 }
      if (runLen <= k) {
        if (w != r) { buf.cos(w) = buf.cos(r); buf.ids(w) = buf.ids(r) }
        w += 1
      }
      r += 1
    }
    buf.len = w
  }

  private def insert(buf: TopKBuf, c: Double, id: Long): Unit = {
    if (buf.len >= k && c < buf.cos(k - 1) - Eps) return // fast reject
    buf.ensure(buf.len + 1)
    var pos = buf.len
    while (pos > 0 && !before(buf.cos(pos - 1), buf.ids(pos - 1), c, id)) pos -= 1
    System.arraycopy(buf.cos, pos, buf.cos, pos + 1, buf.len - pos)
    System.arraycopy(buf.ids, pos, buf.ids, pos + 1, buf.len - pos)
    buf.cos(pos) = c
    buf.ids(pos) = id
    buf.len += 1
    prune(buf)
  }

  // After binding, plain column children become BoundReferences — read
  // those primitively (eval would box a Double per pair on the O(n²)
  // update path).
  private lazy val cosOrd = cosChild match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
      if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }
  private lazy val idOrd = idChild match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
      if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    if (cosOrd >= 0 && idOrd >= 0) {
      if (!input.isNullAt(cosOrd) && !input.isNullAt(idOrd))
        insert(buf, input.getDouble(cosOrd), input.getLong(idOrd))
    } else {
      val c = cosChild.eval(input)
      val id = idChild.eval(input)
      if (c != null && id != null)
        insert(buf, c.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.len) { insert(buf, other.cos(i), other.ids(i)); i += 1 }
    buf
  }

  /** Spark's round(x, 8) semantics exactly (RoundBase double path). */
  private def round8(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()

  override def eval(buf: TopKBuf): Any = {
    val n = buf.len
    val rc = new Array[Double](n)
    val ri = new Array[Long](n)
    var i = 0
    while (i < n) { rc(i) = round8(buf.cos(i)); ri(i) = buf.ids(i); i += 1 }
    // selection-sort into the final (rounded desc, id asc) order; n ~ k
    val out = new Array[Any](math.min(k, n))
    val used = new Array[Boolean](n)
    var o = 0
    while (o < out.length) {
      var best = -1
      i = 0
      while (i < n) {
        if (!used(i) && (best < 0 || before(rc(i), ri(i), rc(best), ri(best)))) best = i
        i += 1
      }
      used(best) = true
      out(o) = new GenericInternalRow(Array[Any](rc(best), ri(best)))
      o += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.len * 16)
    bb.putInt(buf.len)
    var i = 0
    while (i < buf.len) { bb.putDouble(buf.cos(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuf(new Array[Double](math.max(n, k + 4)),
      new Array[Long](math.max(n, k + 4)), n)
    var i = 0
    while (i < n) { buf.cos(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNbrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNbrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKNbrAgg =
    copy(cosChild = newLeft, idChild = newRight)
}
