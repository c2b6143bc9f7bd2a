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
}
