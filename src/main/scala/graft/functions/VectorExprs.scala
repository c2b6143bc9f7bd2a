package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector/text hot paths.
  *
  * The interpreted higher-order-function formulation
  * (`aggregate(zip_with(...))`) costs a closure call + boxing per element;
  * these expressions run one fused primitive loop per row — `CosineSim`
  * participates in whole-stage codegen via `doGenCode`, so a 4M-pair kNN
  * join stays inside one generated loop.
  */
object VectorExprs {

  private def toColumn(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  /** cosine(a, b) over numeric arrays → double. */
  def cosineSim(a: Column, b: Column): Column = toColumn(CosineSim(ex(a), ex(b)))

  /** dot(a, b) over numeric arrays → double (left-to-right accumulation). */
  def dotProduct(a: Column, b: Column): Column = toColumn(DotProduct(ex(a), ex(b)))

  /** Jaccard similarity of two string arrays (treated as sets). */
  def jaccardSim(a: Column, b: Column): Column = toColumn(JaccardSim(ex(a), ex(b)))

  /** Jaccard over pre-deduped, pre-sorted arrays (allocation-free merge). */
  def jaccardSimSorted(a: Column, b: Column): Column =
    toColumn(JaccardSim(ex(a), ex(b), assumeSorted = true))

  /** All character n-grams of a string. */
  def charNgrams(text: Column, n: Int): Column = toColumn(CharNgrams(ex(text), n))

  /** 64-bit SimHash of a token array (FNV-1a token hashes). */
  def simHash64(tokens: Column): Column = toColumn(SimHash64(ex(tokens)))

  /** MinHash signature (`nPerm` affine permutations over `k`-char shingle
    * FNV hashes).
    */
  def minHashSig(text: Column, k: Int = 5, nPerm: Int = 16): Column =
    toColumn(MinHashSig(ex(text), k, nPerm))

  private[functions] def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** Cosine similarity between two numeric arrays; whole-stage-codegen
  * friendly (single fused loop, no allocation).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** float/double arrays pass through untouched (no per-row array copy on
    * the hot path); anything else is implicitly cast to array<double>.
    */
  override def inputTypes: Seq[DataType] =
    Seq(left, right).map(_.dataType match {
      case t @ ArrayType(FloatType | DoubleType, _) => t
      case _ => ArrayType(DoubleType)
    })

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = ${getter(ta, a, i)};
         |  double y = ${getter(tb, b, i)};
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two numeric arrays, left-to-right accumulation;
  * whole-stage-codegen friendly like [[CosineSim]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def inputTypes: Seq[DataType] =
    Seq(left, right).map(_.dataType match {
      case t @ ArrayType(FloatType | DoubleType, _) => t
      case _ => ArrayType(DoubleType)
    })

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = ta match { case FloatType => a.getFloat(i).toDouble; case _ => a.getDouble(i) }
      val y = tb match { case FloatType => b.getFloat(i).toDouble; case _ => b.getDouble(i) }
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    val (ta, tb) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${getter(ta, a, i)}) * (${getter(tb, b, i)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity |A∩B| / |A∪B| of two string arrays.
  *
  * With `assumeSorted` (inputs pre-deduped + `sort_array`ed upstream) the
  * intersection is an allocation-free two-pointer merge; otherwise a
  * HashSet pass. Codegen delegates to [[compute]] via a reference object,
  * so surrounding operators stay in whole-stage codegen.
  */
case class JaccardSim(left: Expression, right: Expression, assumeSorted: Boolean = false)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  def compute(a: ArrayData, b: ArrayData): Double = {
    if (assumeSorted) {
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var inter = 0
      while (i < na && j < nb) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { inter += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      val union = na + nb - inter
      if (union == 0) 0.0 else inter.toDouble / union
    } else {
      val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
      var i = 0
      while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
      val setB = new java.util.HashSet[UTF8String](b.numElements() * 2)
      i = 0
      while (i < b.numElements()) { setB.add(b.getUTF8String(i)); i += 1 }
      var inter = 0
      val it = setB.iterator()
      while (it.hasNext) if (setA.contains(it.next())) inter += 1
      val union = setA.size() + setB.size() - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccard", this, classOf[JaccardSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** All character n-grams of a string as array<string>. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(input: UTF8String): GenericArrayData = {
    val s = input.toString
    val count = math.max(s.length - n + 1, 0)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = UTF8String.fromString(s.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charNgrams", this, classOf[CharNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-bit ±1 votes of FNV-1a token
  * hashes, packed to a long.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.numElements()) {
      val bytes = toks.getUTF8String(i).getBytes
      val h = VectorExprs.fnv1a(bytes, 0, bytes.length)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature: min over k-char shingles of `nPerm` affine
  * permutations of the shingle's FNV-1a hash, mod 2^61−1.
  */
case class MinHashSig(child: Expression, k: Int, nPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val Prime = 2305843009213693951L // 2^61 - 1

  def compute(input: UTF8String): GenericArrayData = {
    val bytes = input.getBytes
    val nSh = math.max(bytes.length - k + 1, 0)
    val mins = Array.fill(nPerm)(Long.MaxValue)
    var i = 0
    while (i < nSh) {
      val h = VectorExprs.fnv1a(bytes, i, i + k) & 0x7fffffffL
      var j = 0
      while (j < nPerm) {
        val a = 1103515245L + 12345L * j
        val b = 1013904223L + 7L * j
        val v = (h * a + b) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == Long.MaxValue) 0L else m): Array[Long])
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
