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

  test("one-pass coreset sketch: radius bound holds at any partitioning, per-label grouping works") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val greedyRadius = Similarity.kCenterSelect(spark, sfDir, k = 16).last._4
    val all = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val byId = all.toMap
    def coverRadius(centerIds: Seq[Long]): Double = {
      val cs = centerIds.map(byId).toArray
      all.map { case (_, v) =>
        cs.map { c =>
          var acc = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - c(i); acc += t * t; i += 1 }
          math.sqrt(acc)
        }.min
      }.max
    }
    // the covering bound must hold regardless of how the fold partitions
    for (parts <- Seq(1, 3, 8)) {
      val (ids, r) = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])]
        .repartition(parts)
        .groupByKey(_ => 0)
        .agg(new Similarity.CoresetSketch(16).toColumn)
        .take(1).head._2
      assert(ids.length <= 16 && ids.nonEmpty, s"parts=$parts size=${ids.length}")
      val cr = coverRadius(ids)
      assert(cr <= 8.0 * greedyRadius + 1e-9,
        s"parts=$parts: one-pass cover $cr vs greedy $greedyRadius (r=$r)")
      info(f"parts=$parts: ${ids.length} centers, cover $cr%.3f " +
        f"(${cr / greedyRadius}%.2fx greedy), r=$r%.3f")
    }
    // per-group usage: one pass yields a ≤k exemplar set PER LABEL
    val perLabel = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Int, Long, Array[Double])]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new Similarity.CoresetSketch(8).toColumn)
      .collect()
    val labels = Tables.embeddings(spark, sfDir)
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(perLabel.map(_._1).toSet === labels)
    perLabel.foreach { case (l, (ids, _)) =>
      assert(ids.nonEmpty && ids.length <= 8, s"label $l: ${ids.length}")
    }
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
