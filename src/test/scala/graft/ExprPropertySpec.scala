package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Property-style checks of the native expressions against straightforward
  * Scala reference implementations (raw ScalaCheck generators, fixed
  * seeds, sampled deterministically).
  */
class ExprPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("CosineSim equals a reference dot/norm implementation") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.choose(-5.0f, 5.0f))
    val pairs = samples(Gen.zip(vecGen, vecGen), 20)
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    assert(pairs.nonEmpty)
    val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
    val got = df.select(VectorExprs.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      assert(math.abs(g - dot / (math.sqrt(na) * math.sqrt(nb))) < 1e-12)
    }
  }

  test("JaccardSim (both modes) equals Scala Set jaccard") {
    import spark.implicits._
    val setGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    val pairs = samples(Gen.zip(setGen, setGen), 20)
      .map { case (a, b) => (a.toSet, b.toSet) }
    val df = pairs.map { case (a, b) => (a.toArray.sorted, b.toArray.sorted) }.toDF("a", "b")
    val out = df.select(
      VectorExprs.jaccardSim(col("a"), col("b")).as("h"),
      VectorExprs.jaccardSimSorted(col("a"), col("b")).as("m")).collect()
    pairs.zip(out).foreach { case ((sa, sb), r) =>
      val want = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(r.getDouble(0) == want && r.getDouble(1) == want)
    }
  }

  test("CharNgrams covers every position exactly once") {
    import spark.implicits._
    val strs = samples(Gen.alphaLowerStr.map(_.take(40)), 20) :+ "" :+ "ab" :+ "abc"
    val df = strs.toDF("t")
    val out = df.select(col("t"), VectorExprs.charNgrams(col("t"), 3)).collect()
    out.foreach { r =>
      val s = r.getString(0)
      val want = if (s.length < 3) Seq.empty else s.sliding(3).toSeq
      assert(r.getSeq[String](1) == want, s"for '$s'")
    }
  }

  test("MinHash: equal strings agree; shared-shingle strings share mins") {
    import spark.implicits._
    val strs = samples(Gen.alphaLowerStr.map(s => (s + "abcdefgh").take(30)), 10)
    val df = strs.map(s => (s, s)).toDF("x", "y")
    val out = df.select(VectorExprs.minHashSig(col("x")), VectorExprs.minHashSig(col("y"))).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](0).size == 16)
    }
  }

  test("TopKNbrAgg equals brute-force round-then-sort top-k on adversarial near-ties") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    def round8(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
    // values clustered tightly around few centers → rounded collisions,
    // sub-1e-8 gaps, and exact duplicates all occur
    val center = Gen.oneOf(0.1, 0.5, 0.123456785)
    val jitter = Gen.oneOf(0.0, 1e-9, 2e-9, -3e-9, 5e-9, -5e-9, 1e-7, -1e-7)
    val rowGen = Gen.zip(Gen.choose(1L, 5L), Gen.zip(center, jitter), Gen.choose(100L, 140L))
    val rows = samples(rowGen, 400)
      .map { case (g, (c, j), id) => (g, c + j, id) }
      .distinctBy(t => (t._1, t._3)) // one cosine per (group, neighbor)
    val k = 3
    val topk = GraftBridge.column(functions.TopKNbrAgg(
      GraftBridge.expression(col("cos_sim")),
      GraftBridge.expression(col("id_b")), k).toAggregateExpression())
    val got = rows.toDF("id_a", "cos_sim", "id_b").repartition(7)
      .groupBy("id_a").agg(topk.as("nbrs"))
      .select(col("id_a"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getStruct(2).getDouble(0), r.getStruct(2).getLong(1)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toList).toMap
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      rs.map(t => (round8(t._2), t._3))
        .sortBy { case (c, id) => (-c, id) }
        .take(k).toList
    }.toMap
    assert(got == want, s"mismatch:\n got=$got\nwant=$want")
  }

  test("InterCount equals Scala Set intersection; bounded and symmetric") {
    import spark.implicits._
    val setGen = Gen.listOf(Gen.oneOf((1 to 12).map(i => s"t$i")))
    val pairs = samples(Gen.zip(setGen, setGen), 30)
      .map { case (a, b) => (a.toSet, b.toSet) }
    val df = pairs.map { case (a, b) =>
      (a.toArray.sorted, b.toArray.sorted) }.toDF("a", "b")
    val got = df.select(
        VectorExprs.interCountSorted(col("a"), col("b")).as("ab"),
        VectorExprs.interCountSorted(col("b"), col("a")).as("ba"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    pairs.zip(got).foreach { case ((a, b), (ab, ba)) =>
      assert(ab == a.intersect(b).size, s"$a ∩ $b")
      assert(ab == ba, "intersection must be symmetric")
      assert(ab <= math.min(a.size, b.size))
    }
  }

  test("DeflateLen: concatenating a string with itself compresses sublinearly") {
    import spark.implicits._
    val strGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
      .map(s => s * 4) // ensure enough length for the dictionary to bite
    val strs = samples(strGen, 20).filter(_.length >= 40)
    assert(strs.nonEmpty)
    val df = strs.map(s => (s, s + s)).toDF("s", "ss")
    val got = df.select(VectorExprs.deflateLen(col("s")).as("a"),
        VectorExprs.deflateLen(col("ss")).as("b"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    got.foreach { case (a, b) =>
      assert(a > 0 && b > 0)
      // the second copy is pure back-reference: far below double cost
      assert(b < 2 * a, s"doubling cost $a -> $b not sublinear")
    }
  }
}
