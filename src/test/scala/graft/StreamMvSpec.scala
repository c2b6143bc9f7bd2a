package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Incremental

import scala.jdk.CollectionConverters._

/** Streaming materialized-view maintenance: micro-batches append
  * partial-aggregate rows (never rewriting existing files — the LSM
  * posture), the read-time view compacts per key, and offline
  * compaction collapses partials without changing the view.
  */
class StreamMvSpec extends SparkSpec {

  private def tableFiles(name: String): Map[String, Long] = {
    val loc = Paths.get(
      spark.sessionState.conf.warehousePath.stripPrefix("file:"), name)
    if (!Files.exists(loc)) Map.empty
    else Files.walk(loc).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.size(p)).toMap
  }

  /** Drop the snapshot AND its commit ledger — catalog entries plus any
    * warehouse files a previous JVM's run left that THIS JVM's catalog
    * has never heard of (the drop alone can't see those, and the first
    * append would land on top of stale data).
    */
  private def dropSnap(snap: String): Unit =
    Seq(snap, Incremental.ledgerTable(snap)).foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = Paths.get(
        spark.sessionState.conf.warehousePath.stripPrefix("file:"), name)
      if (Files.exists(loc))
        Files.walk(loc).sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
    }

  test("streaming MV: appended partials compose to the batch aggregate; appends never rewrite") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val snap = "graft_test_mv_stream"
    dropSnap(snap)
    val mem = MemoryStream[(Long, Long, Double)]
    val stream = mem.toDF().toDF("o_orderkey", "o_custkey", "o_totalprice")
    val q = Incremental.refreshStream(stream, snap).start()
    try {
      mem.addData((1L, 10L, 100.50), (2L, 11L, 20.25))
      q.processAllAvailable()
      val after1 = tableFiles(snap)
      assert(after1.nonEmpty, "first batch must create snapshot files")
      mem.addData((3L, 10L, 9.99), (4L, 12L, 1.00))
      q.processAllAvailable()
      val after2 = tableFiles(snap)
      // LSM append contract: every batch-1 file survives byte-identical
      after1.foreach { case (f, sz) =>
        assert(after2.get(f).contains(sz), s"batch-1 file rewritten: $f")
      }
      assert(after2.size > after1.size, "second batch must add new files")
    } finally q.stop()

    def viewRows: Map[Long, (Long, Long)] =
      Incremental.readView(spark, snap).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = Map(
      10L -> (2L, 11049L), // 100.50 and 9.99 → 10050 + 999 cents
      11L -> (1L, 2025L),
      12L -> (1L, 100L))
    assert(viewRows == expected, s"merge-on-read view diverges: $viewRows")

    // partials: customer 10 has one row per batch until compaction
    assert(spark.table(snap).count() == 4)
    Incremental.compact(spark, snap)
    assert(spark.table(snap).count() == 3, "compaction must leave one row per key")
    assert(viewRows == expected, "compaction must not change the view")
  }

  test("streaming MV restart under a checkpoint: committed batches never re-append") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val snap = "graft_test_mv_restart"
    dropSnap(snap)
    val ckpt = Files.createTempDirectory("mv_ckpt").toString
    val mem = MemoryStream[(Long, Long, Double)]
    def start() = Incremental
      .refreshStream(mem.toDF().toDF("o_orderkey", "o_custkey", "o_totalprice"), snap)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    mem.addData((1L, 10L, 100.50))
    q1.processAllAvailable()
    q1.stop()
    // restart against the SAME checkpoint: the committed batch must not
    // replay into a second append; only new data lands
    val q2 = start()
    mem.addData((2L, 10L, 9.99))
    q2.processAllAvailable()
    q2.stop()
    val view = Incremental.readView(spark, snap).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(view == Map(10L -> (2L, 11049L)),
      s"restart must be exactly-once, got $view")
  }

  test("streaming MV: a replayed batch (crash between write and checkpoint commit) appends nothing") {
    import spark.implicits._
    val snap = "graft_test_mv_replay"
    dropSnap(snap)
    val b0 = Seq((1L, 10L, 100.50), (2L, 11L, 20.25))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    Incremental.appendBatch(b0, 0L, snap)
    val files1 = tableFiles(snap)
    // foreachBatch is at-least-once: simulate the crash-replay by
    // delivering the SAME batchId again — the post-data commit ledger
    // must swallow it byte-for-byte
    Incremental.appendBatch(b0, 0L, snap)
    assert(tableFiles(snap) == files1,
      "replayed batchId must not append or rewrite any file")
    Incremental.appendBatch(
      Seq((3L, 10L, 9.99)).toDF("o_orderkey", "o_custkey", "o_totalprice"),
      1L, snap)
    val view = Incremental.readView(spark, snap).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(view == Map(10L -> (2L, 11049L), 11L -> (1L, 2025L)),
      s"post-replay view wrong: $view")
  }

  test("streaming MV: a TORN batch (partition partially visible, no ledger row) is rewritten whole on replay") {
    import spark.implicits._
    val snap = "graft_test_mv_torn"
    dropSnap(snap)
    Incremental.appendBatch(
      Seq((1L, 10L, 100.50)).toDF("o_orderkey", "o_custkey", "o_totalprice"),
      0L, snap)
    // simulate a driver crash mid-job-commit on batch 1: ONE of the
    // batch's two customer rows became visible under the batch_id=1
    // partition, and the crash happened before the ledger row — exactly
    // the window where a visibility probe would wrongly skip the replay
    Seq((11L, 1L, 2025L, 1L))
      .toDF("o_custkey", "n_orders", "total_cents", "batch_id")
      .write.mode("append").format("parquet")
      .partitionBy("batch_id").saveAsTable(snap)
    val torn = Incremental.readView(spark, snap).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(torn == Map(10L -> (1L, 10050L), 11L -> (1L, 2025L)),
      s"torn-state precondition wrong: $torn")
    // the at-least-once replay delivers the FULL batch 1; with no
    // ledger row it must overwrite exactly its own partition — the
    // partial row is wiped, nothing duplicates, batch 0 is untouched
    Incremental.appendBatch(
      Seq((2L, 11L, 20.25), (3L, 12L, 1.00))
        .toDF("o_orderkey", "o_custkey", "o_totalprice"),
      1L, snap)
    val view = Incremental.readView(spark, snap).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(view == Map(10L -> (1L, 10050L), 11L -> (1L, 2025L), 12L -> (1L, 100L)),
      s"torn-batch replay must rewrite the partition whole, got $view")
    // and now that the ledger row exists, a SECOND replay is a no-op
    val files = tableFiles(snap)
    Incremental.appendBatch(
      Seq((2L, 11L, 20.25), (3L, 12L, 1.00))
        .toDF("o_orderkey", "o_custkey", "o_totalprice"),
      1L, snap)
    assert(tableFiles(snap) == files, "post-ledger replay must not touch files")
  }

  test("streaming MV: a late replay of a compacted-away batch id still skips") {
    import spark.implicits._
    val snap = "graft_test_mv_lateclean"
    dropSnap(snap)
    val b0 = Seq((1L, 10L, 100.50)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    Incremental.appendBatch(b0, 0L, snap)
    Incremental.compact(spark, snap)
    // batch 0's partition is gone (folded into batch_id = -1), but its
    // ledger row survived compaction — the replay must NOT re-append
    Incremental.appendBatch(b0, 0L, snap)
    val view = Incremental.readView(spark, snap).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(view == Map(10L -> (1L, 10050L)),
      s"compacted-away id replay must skip, got $view")
  }

  test("streaming distinct MV: sketch partials union to the one-pass estimate; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val snap = "graft_test_dau_stream"
    dropSnap(snap)
    val day0 = 86400000000L
    val mem = MemoryStream[(Long, Long)]
    val stream = mem.toDF().toDF("ts_us", "user_id")
    val q = Incremental.distinctStream(stream, snap).start()
    val all = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    try {
      // two triggers, same day split across both + a second day
      val b1 = Seq((day0 + 1L, 1L), (day0 + 2L, 2L), (2 * day0 + 1L, 1L))
      val b2 = Seq((day0 + 3L, 2L), (day0 + 4L, 3L), (2 * day0 + 2L, 9L))
      all ++= b1 ++= b2
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val view = Incremental.readDistinctView(spark, snap).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // parity: union of per-batch partial sketches == one-pass sketch
    val onePass = Incremental.dailyUserSketch(
        all.toSeq.toDF("ts_us", "user_id"))
      .select(col("day"), expr("hll_sketch_estimate(sk)").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(view == onePass, s"view $view vs one-pass $onePass")
    // tiny exact sets: HLL is exact here — day 1 has users {1,2,3}
    assert(view(1L) == 3L && view(2L) == 2L)
    // an at-least-once REPLAY of batch 1 must not change the view
    Incremental.idempotentAppend(
      Incremental.dailyUserSketch(b1rows(day0)), 0L, snap)
    val replayed = Incremental.readDistinctView(spark, snap).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed == view, "ledgered replay changed the view")
  }

  private def b1rows(day0: Long) = {
    import spark.implicits._
    Seq((day0 + 1L, 1L), (day0 + 2L, 2L), (2 * day0 + 1L, 1L))
      .toDF("ts_us", "user_id")
  }
}
