package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** q139 MMR diverse selection + q140 greedy k-center coreset: dense
  * driver replays pin the exact greedy sequences, and the defining
  * geometric properties (diversity win over plain top-k; monotone,
  * prefix-dominating covering radius) are asserted on the real corpus.
  */
class SelectionSpec extends SparkSpec {

  private def collectUnitVecs(ids: Seq[Long]): Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids: _*))
      .select("vec_id", "embedding")
      .collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray.map(_.toDouble)
        val n = math.sqrt(e.map(x => x * x).sum)
        r.getLong(0) -> e.map(_ / n)
      }.toMap

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def meanPairwiseCos(ids: Seq[Long]): Double = {
    val u = collectUnitVecs(ids)
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield dot(u(ids(i)), u(ids(j)))
    pairs.sum / pairs.length
  }

  test("q139 MMR: first pick is the relevance argmax, no duplicates, k rows") {
    val sel = Similarity.mmrSelect(spark, sfDir)
    assert(sel.length === 10)
    assert(sel.map(_._2).distinct.length === 10)
    val topRel = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.VectorExprs.cosineSim(col("embedding"),
          typedlit(Array.tabulate(64)(i => (((i + 1) * 37) % 19 - 9) / 10.0)))
          .as("rel"))
      .orderBy(desc("rel"), asc("vec_id"))
      .limit(1).head().getLong(0)
    assert(sel.head._2 === topRel)
    // ranks are 1..k in order
    assert(sel.map(_._1) === (1 to 10))
  }

  test("q139 MMR set is strictly more diverse than plain top-k") {
    val mmrIds = Similarity.mmrSelect(spark, sfDir).map(_._2)
    val topIds = Similarity.bruteTopK(spark, sfDir, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(mmrIds.toSet !== topIds.toSet,
      "MMR must actually trade some relevance for diversity on this corpus")
    assert(meanPairwiseCos(mmrIds) < meanPairwiseCos(topIds),
      "mean pairwise cosine of the MMR set must be below plain top-k's")
  }

  test("q139 MMR parity with a dense driver replay") {
    val got = Similarity.mmrSelect(spark, sfDir, k = 10, poolSize = 50,
      lambda = 0.7)
    // independent replay: pool via the brute top-50, greedy in plain Scala
    val pool = Similarity.bruteTopK(spark, sfDir, 50).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val unit = collectUnitVecs(pool.map(_._1).toSeq)
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    val replay = scala.collection.mutable.ArrayBuffer[Long]()
    while (selected.length < 10) {
      val best = pool.iterator
        .filterNot(p => selected.contains(p._1))
        .map { case (id, rel) =>
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.map(sid => dot(unit(id), unit(sid))).max
          (id, 0.7 * rel - 0.3 * maxSim)
        }
        .maxBy(_._2) // iterator order = pool order; stable for ties
      selected += best._1
      replay += best._1
    }
    assert(got.map(_._2) === replay.toSeq)
  }

  test("q140 k-center: radii monotone non-increasing, picks distinct") {
    val picks = Similarity.kCenterSelect(spark, sfDir)
    assert(picks.length === 16)
    assert(picks.map(_._2).distinct.length === 16)
    val radii = picks.map(_._4)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"covering radius must shrink: $radii")
  }

  test("q140 k-center parity with a dense driver replay") {
    val got = Similarity.kCenterSelect(spark, sfDir, k = 8)
    val all = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](2).toArray.map(_.toDouble)))
      .sortBy(_._1)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      // same algebra as the plan: ‖a‖² − 2a·b + ‖b‖²
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    }
    var center = all.maxBy(v => (dot(v._2, v._2), -v._1))._1
    val minSq = scala.collection.mutable.Map(
      all.map(v => v._1 -> Double.MaxValue): _*)
    val replayPicks = scala.collection.mutable.ArrayBuffer[Long]()
    val replayRadii = scala.collection.mutable.ArrayBuffer[Double]()
    val vecOf = all.toMap
    for (r <- 1 to 8) {
      val c = vecOf(center)
      all.foreach { case (id, v) =>
        minSq(id) = math.min(minSq(id), sq(v, c)) }
      val far = all.map(_._1).minBy(id => (-minSq(id), id))
      replayPicks += center
      replayRadii += math.sqrt(math.max(minSq(far), 0.0))
      center = far
    }
    assert(got.map(_._2) === replayPicks.toSeq)
    got.map(_._4).zip(replayRadii).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"radius drift: $a vs $b") }
  }

  test("q140 greedy cover dominates a naive first-k prefix pick") {
    val greedy = Similarity.kCenterSelect(spark, sfDir, k = 8)
    val greedyRadius = greedy.last._4
    // naive baseline: centers = the first 8 vec_ids
    val all = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    val centers = all.take(8).map(_._2)
    val naiveRadius = math.sqrt(all.map { case (_, v) =>
      centers.map(c => dot(v, v) - 2 * dot(v, c) + dot(c, c)).min
    }.max)
    assert(greedyRadius < naiveRadius,
      s"greedy $greedyRadius must beat naive prefix $naiveRadius")
  }
}
