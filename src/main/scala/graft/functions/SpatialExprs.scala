package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Space-filling-curve expressions for clustered data layout. */
object SpatialExprs {

  /** Hilbert-curve index of a 2-D cell (both coordinates in
    * [0, 2^bits)) → long. Unlike the Morton interleave, consecutive
    * Hilbert indices are always edge-adjacent cells, so there is no
    * seam where a small box predicate straddles distant curve
    * positions — the property the centered-box layout spec measures.
    */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(
      HilbertIndex(GraftBridge.expression(x), GraftBridge.expression(y), bits))

  /** Hilbert-curve index over ANY number of dimensions (each coordinate
    * in [0, 2^bits), `bits·dims ≤ 63`) → long — see [[HilbertIndexN]].
    */
  def hilbertIndexN(dims: Seq[Column], bits: Int): Column =
    GraftBridge.column(
      HilbertIndexN(dims.map(GraftBridge.expression), bits))
}

/** d = hilbert(x, y) via the standard per-bit rotate-and-accumulate walk
  * (one fused loop per row in both interpreted and generated form — the
  * naive Column-fold formulation would replicate the rotation state
  * sub-tree ~4× per bit under CollapseProject and explode the plan).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 31, s"hilbert bits out of range: $bits")

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    HilbertIndex.xy2d(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Interpreted twin of the generated loop. */
  def xy2d(xi: Long, yi: Long, bits: Int): Long = {
    var x = xi; var y = yi; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** N-dimensional Hilbert index via Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004): the
  * axes fold into the curve's "transposed" bit-matrix in place —
  * per-level undo of the sub-cube rotations, then a Gray encode — and
  * the index is the MSB-first interleave of the transposed coordinates.
  * O(dims·bits) per row, no allocation beyond one dims-length scratch
  * array. Like the 2-D walk, consecutive indices are edge-adjacent
  * cells in every dimension count (bijectivity + unit-step are
  * spec-exhausted at 3-D), which is what closes the "3-D+ layouts fall
  * back to the weaker Morton curve" gap for [[graft.sources.ZOrder]].
  * (The 2-D [[HilbertIndex]] keeps its own orientation for layout
  * stability; the two curves are reflections, equally seam-free.)
  */
case class HilbertIndexN(children: Seq[Expression], bits: Int)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(children.nonEmpty, "hilbert_n needs at least one dimension")
  require(bits >= 1 && bits * children.length <= 63,
    s"$bits bits x ${children.length} dims overflows a long")

  override def inputTypes: Seq[DataType] = Seq.fill(children.length)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndexN.encodeInPlace(xs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val n = children.length
    val arr = ctx.freshName("dims")
    val evals = children.map(_.genCode(ctx))
    val setup = evals.zipWithIndex.map { case (e, i) =>
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) { ${ev.isNull} = true; }
         |  else { $arr[$i] = ${e.value}; }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
         |boolean ${ev.isNull} = false;
         |long ${ev.value} = -1L;
         |long[] $arr = new long[$n];
         |$setup
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    graft.functions.HilbertIndexN$$.MODULE$$.encodeInPlace($arr, $bits);
         |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexN =
    copy(children = newChildren)
}

object HilbertIndexN {
  /** Axes → Hilbert index; mutates a COPY of `xsIn` (the safe public
    * face — callers keep their array).
    */
  def encode(xsIn: Array[Long], bits: Int): Long =
    encodeInPlace(java.util.Arrays.copyOf(xsIn, xsIn.length), bits)

  /** The zero-copy entry the expression's eval and generated
    * code use: both build a fresh per-row dims array already, so this
    * CONSUMES (mutates) `xs` — one dims-length allocation per row
    * total, not two.
    */
  def encodeInPlace(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    val m = 1L << (bits - 1)
    // undo the per-level sub-cube rotations (Skilling's "inverse undo")
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((xs(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // the index is the transposed coordinates interleaved MSB-first
    // (bit bits-1 of xs(0) is the index's most significant bit)
    var d = 0L
    var bit = bits - 1
    while (bit >= 0) {
      var j = 0
      while (j < n) {
        d = (d << 1) | ((xs(j) >> bit) & 1L)
        j += 1
      }
      bit -= 1
    }
    d
  }
}
