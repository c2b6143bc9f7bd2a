package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.sim.Similarity
import graft.sim.Similarity.{CoresetSnap, StreamVec}

/** Streaming k-center (doubling algorithm) vs its contracts: bounded
  * state, the pairwise-separation invariant, an empirical covering bound
  * tied to the batch greedy radius, and fixed-batch-split determinism.
  */
class CoresetStreamSpec extends SparkSpec {

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
    math.sqrt(acc)
  }

  private def allVecs(): Array[(Long, Array[Double])] =
    Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)

  private def runStream(batches: Seq[Seq[StreamVec]], name: String)
      : Array[CoresetSnap] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamVec]
    val q = Similarity.coresetStream(mem.toDS(), k = 16)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[CoresetSnap].collect().sortBy(_.n_seen)
    } finally q.stop()
  }

  test("doubling coreset: bounded state, separation invariant, covering bound") {
    val vecs = allVecs()
    val batches = vecs.grouped(math.max(1, vecs.length / 3)).toSeq
      .map(_.toSeq.map(v => StreamVec(v._1, v._2.toSeq.map(_.toFloat))))
    val snaps = runStream(batches, "coreset1")
    assert(snaps.length === batches.length)
    // one snapshot per trigger; n_seen strictly increases to the corpus size
    assert(snaps.last.n_seen === vecs.length)
    snaps.foreach { s =>
      assert(s.n_centers <= 16, s"state overflow: ${s.n_centers}")
      assert(s.center_ids.distinct.length === s.n_centers)
    }
    val fin = snaps.last
    val byId = vecs.toMap
    val centers = fin.center_ids.map(byId).toArray
    // invariant: surviving centers sit pairwise farther than r apart
    for (i <- centers.indices; j <- (i + 1) until centers.length)
      assert(dist(centers(i), centers(j)) > fin.r,
        s"centers $i,$j violate the separation threshold ${fin.r}")
    // empirical covering bound: the doubling algorithm is an 8-approx and
    // the batch greedy a 2-approx, so stream radius ≤ 8·OPT ≤ 8·greedy
    val streamRadius = vecs.map { case (_, v) =>
      centers.map(c => dist(v, c)).min }.max
    val greedyRadius = Similarity.kCenterSelect(spark, sfDir, k = 16).last._4
    assert(streamRadius <= 8.0 * greedyRadius + 1e-9,
      s"covering radius $streamRadius exceeds 8x greedy $greedyRadius")
    info(f"stream radius $streamRadius%.3f vs greedy $greedyRadius%.3f " +
      f"(${streamRadius / greedyRadius}%.2fx), r=${fin.r}%.3f")
  }

  test("doubling coreset is deterministic for a fixed batch split") {
    val vecs = allVecs().take(300)
    val batches = vecs.grouped(100).toSeq
      .map(_.toSeq.map(v => StreamVec(v._1, v._2.toSeq.map(_.toFloat))))
    val a = runStream(batches, "coreset2a")
    val b = runStream(batches, "coreset2b")
    assert(a.map(s => (s.n_seen, s.n_centers, s.r, s.center_ids)).toSeq ===
      b.map(s => (s.n_seen, s.n_centers, s.r, s.center_ids)).toSeq)
  }
}
