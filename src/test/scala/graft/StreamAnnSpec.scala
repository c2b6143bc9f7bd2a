package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.VectorExprs

import scala.jdk.CollectionConverters._

/** Streaming ANN probe vs its batch oracle: query vectors arriving on a
  * stream must get exactly the candidates the batch path computes over
  * the same persisted index — including across multiple micro-batches —
  * and the catalog's fixed query must reproduce q56 end-to-end.
  */
class StreamAnnSpec extends SparkSpec {

  private val qv: Seq[Double] =
    Seq.tabulate(64)(i0 => (((i0 + 1) * 37) % 19 - 9) / 10.0)

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("vec_id"), r.getAs[Double]("adc"))

  test("streaming ANN probe equals the batch path per micro-batch, and qv reranks to q56") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // queries: the catalog's fixed qv plus two corpus vectors
    val corpusQs = Tables.embeddings(spark, sfDir).orderBy("vec_id").limit(2)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .take(2).map(r => (1000L + r.getLong(0), r.getSeq[Double](1)))
    val queries: Seq[(Long, Seq[Double])] = (0L, qv) +: corpusQs.toSeq

    val expected = sim.Similarity.annProbe(spark, sfDir,
        queries.toDF("query_id", "qvec"), k = 100)
      .collect().map(key).toSet

    val mem = MemoryStream[(Long, Seq[Double])]
    val res = sim.Similarity.annProbeStream(spark, sfDir,
      mem.toDF().toDF("query_id", "qvec"), k = 100)
    val q = res.writeStream.format("memory").queryName("annprobe")
      .outputMode(OutputMode.Update).start()
    try {
      // two separate micro-batches: each query's group is touched by
      // exactly one trigger, so the sink holds one update per query and
      // per-batch results must equal the batch plan over the same rows
      mem.addData(queries.head)
      q.processAllAvailable()
      val firstBatch = spark.table("annprobe").collect().map(key).toSet
      assert(firstBatch == expected.filter(_._1 == 0L),
        "first micro-batch must equal the batch path for the fed query")
      mem.addData(queries.tail: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("annprobe").collect().map(key).toSet
    assert(got == expected, "streamed candidates must equal the batch path")

    // end-to-end tie to the catalog: exact-cosine rerank of qv's streamed
    // top-100 reproduces q56's top-10 (same candidate set, same rerank)
    val qvLit = expr("transform(sequence(1, 64), i -> (CAST((i * 37) % 19 AS DOUBLE) - 9) / 10)")
    val rerank = spark.table("annprobe").filter(col("query_id") === 0L)
      .select(col("vec_id"))
      .join(Tables.embeddings(spark, sfDir), "vec_id")
      .select(col("vec_id"),
        round(VectorExprs.cosineSim(col("embedding"), qvLit), 8).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val q56 = sim.Similarity.q56.fn(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    assert(rerank == q56, s"qv rerank $rerank != q56 $q56")
  }

  test("streaming NSW probe: each micro-batch equals nswBatchSearch on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // corpus vectors as queries, split over two triggers
    val qs = Tables.embeddings(spark, sfDir).orderBy("vec_id").limit(5)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .take(5).map(r => (r.getLong(0), r.getSeq[Double](1)))
    val (batch1, batch2) = (qs.take(2).toSeq, qs.drop(2).toSeq)
    def asKeys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Double)]]()
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = sim.Similarity.nswProbeStream(spark, sfDir,
        mem.toDF().toDF("qid", "qvec"), 5,
        (res, id) => { got(id) = asKeys(res); () })
      .start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // per-batch parity with the batch path over exactly that trigger's
    // queries (the adjacency-never-shuffles property is q102's plan
    // spec — the stream runs the identical hop code per trigger)
    assert(got.keySet == Set(0L, 1L), s"expected two batches, got ${got.keySet}")
    assert(got(0L) == asKeys(sim.Similarity.nswBatchSearch(
      spark, sfDir, batch1.toDF("qid", "qvec"), 5)),
      "batch 0 diverges from the batch path")
    assert(got(1L) == asKeys(sim.Similarity.nswBatchSearch(
      spark, sfDir, batch2.toDF("qid", "qvec"), 5)),
      "batch 1 diverges from the batch path")
  }

  test("streaming NSW probe with hierarchical routed entry equals the routed batch path") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val qs = Tables.embeddings(spark, sfDir).orderBy("vec_id").limit(4)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .take(4).map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    def asKeys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Double)]]()
    val mem = MemoryStream[(Long, Seq[Double])]
    // the streaming-at-scale configuration: routed O(n^1/4) entry with
    // the expand=12 recall lever the r6 analysis measured
    val q = sim.Similarity.nswProbeStream(spark, sfDir,
        mem.toDF().toDF("qid", "qvec"), 5,
        (res, id) => { got(id) = asKeys(res); () },
        expand = 12, entryProbes = Some(5))
      .start()
    try {
      mem.addData(qs: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.keySet == Set(0L), s"expected one batch, got ${got.keySet}")
    assert(got(0L) == asKeys(sim.Similarity.nswBatchSearch(
      spark, sfDir, qs.toDF("qid", "qvec"), 5, expand = 12,
      entryProbes = Some(5))),
      "routed streaming batch diverges from the routed batch path")
    // and the routed stream really searched: every query returned k rows
    assert(got(0L).groupBy(_._1).forall(_._2.size == 5))
  }

  test("streaming NSW probe + idempotent sink: a crash-replayed batch leaves no duplicate top-k rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the composition the nswProbeStream scaladoc recommends: the sink
    // is Incremental.idempotentAppend, so each trigger's top-k lands
    // under its batch_id partition gated by the post-data commit ledger
    val table = "graft_test_nsw_sink"
    Seq(table, graft.operators.Incremental.ledgerTable(table)).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.sessionState.conf.warehousePath.stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc))
        java.nio.file.Files.walk(loc)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    val qs = Tables.embeddings(spark, sfDir).orderBy("vec_id").limit(3)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .take(3).map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (res, id) => graft.operators.Incremental.idempotentAppend(res, id, table)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = sim.Similarity.nswProbeStream(spark, sfDir,
        mem.toDF().toDF("qid", "qvec"), 5, sink)
      .start()
    try {
      mem.addData(qs: _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows = spark.table(table)
      .select("batch_id", "qid", "node", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val first = rows.toSeq.sorted
    assert(first.nonEmpty && first.map(_._2).toSet == qs.map(_._1).toSet,
      "every query's top-k must land in the sink table")
    assert(first.groupBy(t => (t._2, t._3)).forall(_._2.size == 1),
      "one row per (qid, node) before the replay")
    // foreachBatch is at-least-once: a crash between the sink write and
    // the checkpoint commit re-delivers batch 0 — replay it by hand
    // (the probe recomputes the SAME deterministic top-k) and require
    // the table byte-identical, no duplicate (qid, node) pairs
    sink(sim.Similarity.nswBatchSearch(spark, sfDir, qs.toDF("qid", "qvec"), 5), 0L)
    assert(rows.toSeq.sorted == first,
      "replaying a committed batch must not change the sink table")
  }
}
