package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamDedupSpec extends SparkSpec {

  test("streaming dropDuplicates within watermark suppresses replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val stream = graft.streaming.Events.dedupStream(
      mem.toDF().toDF("ts", "event_id"), "event_id", "1 hour")
    val q = stream.writeStream
      .format("memory").queryName("dedup_stream").outputMode(OutputMode.Append).start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (Timestamp.valueOf("2024-01-01 10:00:01"), 2L))
    q.processAllAvailable()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L), // replayed id
      (Timestamp.valueOf("2024-01-01 10:05:01"), 3L))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("streamDupFlags: arriving docs flag against the persisted corpus signatures") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.dedup.Dedup.writeSignatureTable(spark, sfDir, "stream_sig_corpus", buckets = 4)
    try {
      // one arriving doc duplicates an existing corpus doc verbatim
      // (identical text → identical signatures, collision guaranteed);
      // the other is novel gibberish
      val known = Tables.documents(spark, sfDir)
        .orderBy("doc_id").select("doc_id", "text").limit(1).take(1).head
      val mem = MemoryStream[(Long, String)]
      val q = graft.dedup.Dedup.streamDupFlags(
          mem.toDF().toDF("doc_id", "text"), "stream_sig_corpus")
        .writeStream.format("memory").queryName("dup_flags")
        .outputMode(OutputMode.Append).start()
      mem.addData(
        (900001L, known.getString(1)),
        (900002L, "zq xv kj wq pf mz gx bt dn lr cw yh zq xv kj wq pf mz"))
      q.processAllAvailable()
      q.stop()
      val flagged = spark.table("dup_flags").collect()
      assert(flagged.map(_.getLong(0)).toSet == Set(900001L),
        s"only the verbatim duplicate must flag, got ${flagged.toSeq}")
      // the flag names the colliding corpus doc
      assert(flagged.map(_.getAs[Long]("corpus_doc_id")).contains(known.getLong(0)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS stream_sig_corpus")
    }
  }

  test("contaminationFlags runs as a stateless streaming projection") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bloom = graft.dedup.Dedup.evalGramBloom(spark, sfDir)
    // one arriving doc IS an eval doc verbatim (every gram hits), one is
    // novel gibberish (no 20-gram can be in the filter)
    val evalDoc = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 50 === 0).orderBy("doc_id")
      .select("text").take(1).head.getString(0)
    val mem = MemoryStream[(Long, String)]
    val q = graft.dedup.Dedup.contaminationFlags(
        mem.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("contam_flags")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      (910001L, evalDoc),
      (910002L, "zq xv kj wq pf mz gx bt dn lr cw yh zq xv kj wq pf mz"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("contam_flags")
      .select("doc_id", "maybe_contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows == Map(910001L -> true, 910002L -> false), s"got $rows")
  }

  test("curationStream verdicts match the batch operators row for row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bloom = graft.dedup.Dedup.evalGramBloom(spark, sfDir)
    // stream the non-eval half of the corpus through the curation filter
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 50 =!= 0)
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = graft.text.TextAnalysis.curationStream(
        mem.toDF().toDF("doc_id", "text"), bloom)
      .select("doc_id", "keep_quality", "dup_gram_frac", "maybe_contaminated",
        "lang_pred", "keep")
      .writeStream.format("memory").queryName("curation")
      .outputMode(OutputMode.Append).start()
    mem.addData(docs.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curation").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(2), r.getBoolean(3),
        r.getString(4), r.getBoolean(5)))
      .toMap
    assert(streamed.size == docs.length)
    // batch signals: q61 quality keep, q68 dup_gram_frac, q75 bloom
    // hits, q62 language prediction
    val q61 = graft.text.TextAnalysis.q61.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val q68 = graft.text.TextAnalysis.q68.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_gram_frac")).toMap
    val q75 = graft.dedup.Dedup.q75.fn(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val q62 = graft.text.TextAnalysis.q62.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    streamed.foreach { case (id, (kq, dg, mc, lp, keep)) =>
      assert(kq == q61(id), s"doc $id quality flag diverges from q61")
      assert(dg == q68(id), s"doc $id dup_gram_frac diverges from q68")
      assert(mc == q75.contains(id), s"doc $id contamination diverges from q75")
      assert(lp == q62(id), s"doc $id lang_pred diverges from q62")
      assert(keep == (kq && dg <= 0.30 && !mc))
    }
    // and with a language allow-list, keep additionally requires it
    val batchRun = graft.text.TextAnalysis.curationStream(
        Tables.documents(spark, sfDir).select("doc_id", "text"), bloom,
        allowedLangs = Seq("en"))
      .select("doc_id", "lang_pred", "keep").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    batchRun.foreach { case (id, (lp, keep)) =>
      if (streamed.contains(id)) {
        val (kq, dg, mc, _, _) = streamed(id)
        assert(keep == (kq && dg <= 0.30 && !mc && lp == "en"),
          s"doc $id: allow-list keep wrong")
      }
    }
  }
}
