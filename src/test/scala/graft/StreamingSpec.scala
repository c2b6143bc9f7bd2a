package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Events
import graft.streaming.Events.{Ev, Session}

class StreamingSpec extends SparkSpec {

  test("windowedAggStream produces the batch-equivalent windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Events.windowedAggStream(df).writeStream
      .format("memory").queryName("win_agg").outputMode(OutputMode.Update).start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("win_agg").collect()
      .map(r => (r.getAs[Timestamp]("win_start").toString, r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("total"))).toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
  }

  test("fertilityMonitorStream: windowed stats equal the batch projection; drift alerts fire") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference schedule: q118 on the trusted corpus snapshot
    val ref = text.TextAnalysis.q118.fn(spark, sfDir)
      .select("pred", "fertility")
    val refMap = ref.collect()
      .map(r => r.getAs[String]("pred") -> r.getAs[Double]("fertility")).toMap
    // stream two windows of docs: window 1 in-profile ('the the a' is
    // en-marked with fertility 1.0-ish), window 2 a shredded doc whose
    // fertility balloons (punctuation-heavy → n_re >> n_ws)
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = text.TextAnalysis.fertilityMonitorStream(df, ref).writeStream
      .format("memory").queryName("fert_mon").outputMode(OutputMode.Update).start()
    val normal = "the a value the key row scan the a value table part"
    val shredded = "the!!! a??? value;;; the... key,,, row### scan%%% the a value"
    mem.addData((Timestamp.valueOf("2024-01-01 10:05:00"), normal))
    q.processAllAvailable()
    mem.addData((Timestamp.valueOf("2024-01-01 11:10:00"), shredded))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fert_mon").collect()
      .map(r => (r.getAs[Timestamp]("win_start").toString.take(13),
        r.getAs[String]("pred"), r.getAs[Long]("ws_tokens"),
        r.getAs[Double]("fertility"), r.getAs[Boolean]("alert"))).toList
    assert(out.map(_._1).toSet == Set("2024-01-01 10", "2024-01-01 11"))
    // dense replay of both windows' signals
    def count(t: String, re: String) = re.r.findAllIn(t).size.toLong
    def stats(t: String) = {
      val ws = t.trim.split("\\s+").length.toLong
      val re = count(t, "[a-z]+|[0-9]+|[^a-z0-9\\s]")
      (ws, re.toDouble / ws)
    }
    val (ws1, f1) = stats(normal)
    val (ws2, f2) = stats(shredded)
    val w1 = out.find(_._1 == "2024-01-01 10").get
    val w2 = out.find(_._1 == "2024-01-01 11").get
    assert(w1._3 == ws1 && w1._4 == f1)
    assert(w2._3 == ws2 && w2._4 == f2)
    // both windows predict a reference-known language, so alerts are
    // purely drift-driven: in-profile stays quiet, shredded pages
    assert(refMap.contains(w1._2) && refMap.contains(w2._2))
    assert(!w1._5, s"in-profile window must not alert (drift ${w1._4 / refMap(w1._2)})")
    assert(w2._5, s"shredded window must alert (drift ${w2._4 / refMap(w2._2)})")
  }

  test("heavyHittersStream per-window top-k equals the batch sketch on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = Events.heavyHittersStream(df, k = 3).writeStream
      .format("memory").queryName("hh_win").outputMode(OutputMode.Update).start()
    def ev(m: String, u: Long) = (Timestamp.valueOf(s"2024-01-01 $m:00"), u)
    // two windows, fed across THREE batches so the per-window sketch
    // must accumulate incrementally in the state store
    val batch1 = Seq(ev("10:05", 7L), ev("10:06", 7L), ev("10:07", 3L), ev("10:40", 9L))
    val batch2 = Seq(ev("10:10", 7L), ev("10:12", 3L), ev("10:13", 3L), ev("11:05", 5L))
    // counts kept tie-free inside each window's top-k: the sketch's
    // ORDER among equal counts is insertion-dependent, so a tie at the
    // k-boundary would compare two equally-correct answers
    val batch3 = Seq(ev("10:20", 3L), ev("10:21", 9L), ev("11:10", 5L), ev("11:30", 2L))
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    mem.addData(batch3: _*); q.processAllAvailable()
    q.stop()
    // update mode re-emits a window each batch it changes: keep only the
    // LAST emission per (window, rank) — dedupe via max batch order not
    // needed because the memory sink appends updates in order; group and
    // take the final cnt per key
    val out = spark.table("hh_win").collect()
      .map(r => ((r.getAs[Timestamp]("win_start").toString, r.getAs[Int]("rank")),
        (r.getAs[Long]("item"), r.getAs[Long]("cnt"))))
    val finalPerKey = out.zipWithIndex.groupBy(_._1._1)
      .map { case (key, vs) => key -> vs.maxBy(_._2)._1._2 }
    // the batch sketch over the SAME rows
    val batch = (batch1 ++ batch2 ++ batch3).toDF("ts", "user_id")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(expr("approx_top_k(user_id, 3, 8192)").as("tk"))
      .select(col("w.start").as("win_start"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("win_start"), (col("pos") + 1).cast("int").as("rank"),
        col("e.item").as("item"), col("e.count").as("cnt"))
      .collect()
      .map(r => ((r.getAs[Timestamp]("win_start").toString, r.getAs[Int]("rank")),
        (r.getAs[Long]("item"), r.getAs[Long]("cnt"))))
      .toMap
    assert(finalPerKey == batch,
      s"stream final state $finalPerKey != batch sketch $batch")
    // and the counts themselves are the true frequencies (budget >> items)
    assert(finalPerKey(("2024-01-01 10:00:00.0", 1)) == (3L, 4L))
    assert(finalPerKey(("2024-01-01 10:00:00.0", 2)) == (7L, 3L))
    assert(finalPerKey(("2024-01-01 10:00:00.0", 3)) == (9L, 2L))
  }

  test("sessionizeStream closes sessions across batches on the 30-min gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = Events.sessionizeStream(mem.toDS()).writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append).start()
    val h = 3600000000L // 1h in us
    mem.addData(Ev(1L, 0L, 10L, 1.0), Ev(1L, 60000000L, 11L, 2.0))        // session 1
    q.processAllAvailable()
    mem.addData(Ev(1L, 3 * h, 12L, 4.0))                                  // gap > 30min → closes s1
    q.processAllAvailable()
    mem.addData(Ev(1L, 7 * h, 13L, 8.0))                                  // closes s2
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[Session].collect().sortBy(_.session_idx)
    assert(sessions.length == 2)
    assert(sessions(0) == Session(1L, 1, 10L, 2, 3.0))
    assert(sessions(1) == Session(1L, 2, 12L, 1, 4.0))
  }

  test("transitionStream matches the batch transition counts across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import Events.{TypedEv, Transition}
    val m = 60000000L // 1 min in us
    // two users, one >30-min gap (no transition across it), arbitrary
    // split points; intra-batch arrival order scrambled
    val evs = Seq(
      TypedEv(1L, 0 * m, 1L, "view"), TypedEv(1L, 5 * m, 2L, "click"),
      TypedEv(1L, 8 * m, 3L, "purchase"),
      TypedEv(1L, 120 * m, 4L, "view"), // gap: no transition from id 3
      TypedEv(1L, 125 * m, 5L, "purchase"),
      TypedEv(2L, 2 * m, 6L, "signup"), TypedEv(2L, 3 * m, 7L, "view"))
    val mem = MemoryStream[TypedEv]
    val q = Events.transitionStream(mem.toDS()).writeStream
      .format("memory").queryName("transitions")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    mem.addData(evs(1), evs(0)) // scrambled within the batch
    q.processAllAvailable()
    mem.addData(evs(2), evs(5))
    q.processAllAvailable()
    mem.addData(evs(3), evs(4), evs(6))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("transitions").as[Transition].collect()
      .groupBy(identity).map { case (t, a) => t -> a.length }
    // batch reference: per-user time order, pairs within the 30-min gap
    val ref = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e.ts_us, e.event_id)).sliding(2).collect {
        case Seq(a, b) if b.ts_us - a.ts_us <= 1800000000L =>
          Transition(u, a.event_type, b.event_type)
      }
    }.groupBy(identity).map { case (t, a) => t -> a.length }
    assert(got == ref, s"stream $got != batch $ref")
    assert(got.values.sum == 4) // user 1: 3 (the 112-min gap splits), user 2: 1
  }

  test("pathStream matches q143's pre-limit batch path rule across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import Events.{TypedEv, PathHit}
    val m = 60000000L
    // user 1: two in-gap triples then a session break (no path across
    // it); user 2: exactly one triple; arrival scrambled across batches
    val evs = Seq(
      TypedEv(1L, 0 * m, 1L, "view"), TypedEv(1L, 5 * m, 2L, "click"),
      TypedEv(1L, 8 * m, 3L, "purchase"), TypedEv(1L, 20 * m, 4L, "view"),
      TypedEv(1L, 120 * m, 5L, "error"), // 100-min gap kills the triple
      TypedEv(2L, 2 * m, 6L, "signup"), TypedEv(2L, 3 * m, 7L, "view"),
      TypedEv(2L, 4 * m, 8L, "click"))
    val mem = MemoryStream[TypedEv]
    val q = Events.pathStream(mem.toDS()).writeStream
      .format("memory").queryName("paths")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    // intra-batch arrival scrambled; cross-batch per-user order kept
    // (the source contract all stateful faces share)
    mem.addData(evs(1), evs(0), evs(5))
    q.processAllAvailable()
    mem.addData(evs(3), evs(2), evs(6))
    q.processAllAvailable()
    mem.addData(evs(4), evs(7))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("paths").as[PathHit].collect()
      .groupBy(identity).map { case (p, a) => p -> a.length }
    val ref = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e.ts_us, e.event_id)).sliding(3).collect {
        case Seq(a, b, c) if b.ts_us - a.ts_us <= 1800000000L &&
            c.ts_us - b.ts_us <= 1800000000L =>
          PathHit(u, s"${a.event_type}>${b.event_type}>${c.event_type}")
      }
    }.groupBy(identity).map { case (p, a) => p -> a.length }
    assert(got == ref, s"stream $got != batch $ref")
    // user 1: view>click>purchase, click>purchase>view; user 2: one
    assert(got.values.sum == 3)
  }

  test("quotaAdmitStream: per-source budget valve matches the greedy batch replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import Events.QuotaDoc
    val docs = Seq(
      QuotaDoc(1L, "a", 40), QuotaDoc(2L, "a", 40), QuotaDoc(3L, "a", 40),
      QuotaDoc(4L, "a", 10), // source a is past quota: never admitted
      QuotaDoc(5L, "b", 90), QuotaDoc(6L, "b", 50), // 6 is the crossing doc
      QuotaDoc(7L, "b", 1))  // past quota
    val mem = MemoryStream[QuotaDoc]
    val q = Events.quotaAdmitStream(mem.toDS(), quota = 100L).writeStream
      .format("memory").queryName("admitted")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    mem.addData(docs(1), docs(0), docs(4)) // scrambled arrival
    q.processAllAvailable()
    mem.addData(docs(2), docs(5))
    q.processAllAvailable()
    mem.addData(docs(3), docs(6))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("admitted").as[QuotaDoc].collect().map(_.doc_id).toSet
    // greedy batch replay in the same per-source doc_id order
    val ref = docs.groupBy(_.source).values.flatMap { ds =>
      var cum = 0L
      ds.sortBy(_.doc_id).flatMap { d =>
        if (cum < 100L) { cum += d.n_tok; Some(d.doc_id) } else None
      }
    }.toSet
    assert(got == ref, s"stream $got != batch $ref")
    assert(got == Set(1L, 2L, 3L, 5L, 6L))
  }

  test("windowed agg drops events later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Events.windowedAggStream(df).writeStream
      .format("memory").queryName("late_win").outputMode(OutputMode.Update).start()
    mem.addData((Timestamp.valueOf("2024-01-01 10:10:00"), "click", 1.0))
    q.processAllAvailable()
    // advance event time far past 10:00-11:00 + the 2h watermark
    mem.addData((Timestamp.valueOf("2024-01-01 20:00:00"), "click", 5.0))
    q.processAllAvailable()
    // this event is now > 2h behind the watermark → must be dropped
    mem.addData((Timestamp.valueOf("2024-01-01 10:20:00"), "click", 100.0))
    q.processAllAvailable()
    q.stop()
    val w10 = spark.table("late_win")
      .filter(col("win_start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      .orderBy(desc("n")).collect()
    assert(w10.nonEmpty)
    // the late 100.0 never lands in the 10:00 window's total
    assert(w10.forall(_.getAs[Double]("total") == 1.0))
  }

  test("native session_window merges open sessions bridged by a late event") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val q = Events.sessionWindowStream(df).writeStream
      .format("memory").queryName("native_sessions")
      .outputMode(OutputMode.Append).start()
    // two events 40 min apart → two OPEN sessions [10:00,10:30) [10:40,11:10)
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 10:40:00"), 1L, 2.0))
    q.processAllAvailable()
    // late but within the 2h watermark: lands in the gap and BRIDGES them
    mem.addData((Timestamp.valueOf("2024-01-01 10:20:00"), 1L, 4.0))
    q.processAllAvailable()
    // advance the watermark past the merged session's end to emit it
    mem.addData((Timestamp.valueOf("2024-01-02 00:00:00"), 1L, 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("native_sessions")
      .filter(col("session_start") < Timestamp.valueOf("2024-01-01 23:00:00"))
      .collect()
    assert(rows.length == 1,
      s"bridged sessions must merge into one, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Timestamp]("session_start") == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(r.getAs[Timestamp]("session_end") == Timestamp.valueOf("2024-01-01 11:10:00"))
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Double]("session_value") == 7.0)
  }

  test("intervalJoinStreams joins views to purchases within the 30-min bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val purch = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long, Double)]
    val pDf = purch.toDF().toDF("event_id", "ts", "user_id")
    val vDf = views.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = Events.intervalJoinStreams(pDf, vDf).writeStream
      .format("memory").queryName("ij").outputMode(OutputMode.Append).start()
    views.addData(
      (100L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 5.0), // 10 min before → joins
      (101L, Timestamp.valueOf("2024-01-01 09:30:00"), 1L, 6.0), // 40 min before → outside bound
      (102L, Timestamp.valueOf("2024-01-01 10:05:00"), 2L, 7.0)) // other user
    purch.addData((1L, Timestamp.valueOf("2024-01-01 10:10:00"), 1L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ij").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"),
        r.getAs[Double]("view_value"))).toSet
    assert(out == Set((1L, 100L, 5.0)))
  }

  test("left-outer interval join emits the unmatched purchase after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val purch = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long, Double)]
    val pDf = purch.toDF().toDF("event_id", "ts", "user_id")
    val vDf = views.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = Events.intervalJoinStreams(pDf, vDf, joinType = "leftOuter").writeStream
      .format("memory").queryName("ij_outer").outputMode(OutputMode.Append).start()
    // a purchase with no view in its 30-min window
    purch.addData((1L, Timestamp.valueOf("2024-01-01 10:10:00"), 1L))
    views.addData((100L, Timestamp.valueOf("2024-01-01 08:00:00"), 1L, 5.0)) // too early
    q.processAllAvailable()
    // advance BOTH watermarks far past the purchase's join horizon so the
    // engine can prove no matching view will arrive
    purch.addData((2L, Timestamp.valueOf("2024-01-02 12:00:00"), 9L))
    views.addData((101L, Timestamp.valueOf("2024-01-02 12:00:00"), 9L, 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ij_outer").collect()
      .map(r => (r.getAs[Long]("purchase_id"), Option(r.get(r.fieldIndex("view_id")))))
    assert(out.exists { case (pid, vid) => pid == 1L && vid.isEmpty },
      s"unmatched purchase should emit a null-view row, got ${out.mkString(", ")}")
  }

  test("batch q82 agrees with a driver-side recheck of the interval semantics") {
    val rows = Events.q82.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_views") >= 1)
    }
  }

  test("batch q81 agrees with SQL-windowed q13 session counts") {
    val typed = Events.q81.fn(spark, sfDir)
    val sqlw = operators.Relational.q13.fn(spark, sfDir)
    assert(typed.count() == sqlw.count())
    val a = typed.select("user_id", "first_event", "n_events").collect().toSet
    val b = sqlw.select("user_id", "first_event", "n_events").collect().toSet
    assert(a == b)
  }

  private def anomalyStreamRows(splitAt: Seq[Int]): Set[(String, String, Long, Int, Option[Double], Option[Double], Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type")).orderBy("ts", "event_type")
      .collect().map(r => (r.getAs[Timestamp]("ts"), r.getAs[String]("event_type")))
    val mem = MemoryStream[(Timestamp, String)]
    val name = s"anomaly_${splitAt.mkString("_")}"
    val q = Events.anomalyStream(mem.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    val cuts = (0 +: splitAt :+ evs.length).distinct.sorted
    cuts.sliding(2).foreach { case Seq(a, b) =>
      mem.addData(evs.slice(a, b).toIndexedSeq)
      q.processAllAvailable()
    }
    // sentinel far past the data: pushes the watermark beyond every real
    // hour so all real hours close (its own hour stays open, type-scoped)
    val maxTs = evs.last._1.getTime
    mem.addData((new Timestamp(maxTs + 48L * 3600 * 1000), "zz_sentinel"))
    q.processAllAvailable()
    q.stop()
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    spark.table(name).collect().map { r =>
      (r.getAs[String]("event_type"),
        fmt.format(java.time.Instant.ofEpochMilli(r.getAs[Long]("hr_us") / 1000L)),
        r.getAs[Long]("cnt"), r.getAs[Int]("n24"),
        Option(r.getAs[java.lang.Double]("mean24")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue),
        r.getAs[Boolean]("is_anomaly"))
    }.toSet
  }

  test("anomalyStream flags an injected spike and only the spike") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val q = Events.anomalyStream(mem.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("anomaly_spike")
      .outputMode(OutputMode.Append).start()
    // 30 quiet hours at 5±1 events, then one 50-event spike hour
    val base = Timestamp.valueOf("2024-03-01 00:30:00").getTime
    val quiet = (0 until 30).flatMap { h =>
      val n = 5 + (h % 3) - 1 // 4,5,6 — nonzero variance
      (0 until n).map(i => (new Timestamp(base + h * 3600_000L + i * 1000L), "click"))
    }
    val spike = (0 until 50).map(i => (new Timestamp(base + 30 * 3600_000L + i * 1000L), "click"))
    mem.addData(quiet ++ spike)
    q.processAllAvailable()
    mem.addData((new Timestamp(base + 80 * 3600_000L), "zz"))
    q.processAllAvailable()
    mem.addData((new Timestamp(base + 81 * 3600_000L), "zz"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("anomaly_spike")
      .filter(col("event_type") === "click").collect()
      .map(r => r.getAs[Long]("hr_us") -> r.getAs[Boolean]("is_anomaly")).toMap
    assert(rows.size == 31, s"expected 31 closed click hours, got ${rows.size}")
    val spikeHr = (base + 30 * 3600_000L) / 3600_000L * 3600_000_000L
    assert(rows(spikeHr), "the 10x spike hour must flag as anomalous")
    assert(rows.count(_._2) == 1, s"only the spike may flag: ${rows.filter(_._2)}")
  }

  test("anomalyStream closed hours equal batch q96 rows, independent of batch splits") {
    val streamed = anomalyStreamRows(Seq(1000, 5000))
    val q96 = operators.Relational.q96.fn(spark, sfDir).collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[String]("hr"),
        r.getAs[Long]("cnt"), r.getAs[Int]("n24"),
        Option(r.getAs[java.lang.Double]("mean24")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue),
        r.getAs[Boolean]("is_anomaly"))
    }.toSet
    assert(streamed.nonEmpty)
    // every emitted (closed) hour matches its batch row bit-for-bit —
    // identical integer moments, identical IEEE divisions
    val missing = streamed -- q96
    assert(missing.isEmpty, s"streamed rows absent from batch q96: ${missing.take(3)}")
    // only the tail hours inside the watermark horizon may be unemitted
    assert(streamed.size >= q96.size - 24,
      s"too few closed hours: ${streamed.size} vs batch ${q96.size}")
    // batch-split independence
    assert(anomalyStreamRows(Seq(300, 2000, 7000)) == streamed)
  }

  test("lateFlagsStream matches batch q134 late counts across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import Events.{ArrEv, LateFlag}
    // the REAL events table, replayed in arrival (event_id) order over
    // three arbitrary batch splits
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .as[ArrEv].collect().sortBy(_.event_id)
    val mem = MemoryStream[ArrEv]
    val q = Events.lateFlagsStream(mem.toDS()).writeStream
      .format("memory").queryName("late_flags").outputMode(OutputMode.Append).start()
    evs.grouped(evs.length / 3 + 1).foreach { c =>
      mem.addData(c.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("late_flags").as[LateFlag].collect()
    assert(got.length == evs.length, "every event must be flagged exactly once")
    val gotLate = got.filter(_.is_late).groupBy(_.event_type)
      .map { case (t, a) => t -> a.length.toLong }
    val batch = Events.q134.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_late")).toMap
      .filter(_._2 > 0)
    assert(gotLate == batch,
      s"streamed late counts $gotLate diverge from batch $batch")
  }

  test("occupancyStream: sliding census matches hand count and bounds q179's peak") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Timestamp]
    val df = mem.toDF().toDF("ts")
    val q = Events.occupancyStream(df).writeStream
      .format("memory").queryName("occupancy").outputMode(OutputMode.Update).start()
    // three sessions: two overlap (10:02, 10:14), one isolated (11:40)
    mem.addData(
      Timestamp.valueOf("2024-01-01 10:02:00"),
      Timestamp.valueOf("2024-01-01 10:14:00"),
      Timestamp.valueOf("2024-01-01 11:40:00"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("occupancy").collect()
      .map(r => r.getAs[Timestamp]("sampled_at").toString -> r.getAs[Long]("open_sessions"))
      .toMap
    // at 10:20 both the 10:02 and 10:14 sessions are open
    assert(out("2024-01-01 10:20:00.0") == 2L, s"overlap census: $out")
    // by 10:35 the 10:02 session has closed (len 30 min)
    assert(out("2024-01-01 10:35:00.0") == 1L)
    // the isolated session is alone in every window containing it
    assert(out("2024-01-01 11:45:00.0") == 1L)
    // batch cross-check on the real corpus: the same sliding census in
    // batch mode peaks at most at q179's exact answer (samples can only
    // miss the true instant, never exceed it)
    val sampledMax = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "30 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .agg(max("n")).collect().head.getLong(0)
    val exactPeak = operators.Relational.q179.fn(spark, sfDir)
      .collect().head.getAs[Long]("peak_concurrency")
    assert(sampledMax <= exactPeak,
      s"sampled census $sampledMax exceeds the exact peak $exactPeak")
    assert(sampledMax >= (exactPeak + 1) / 2,
      s"sampled census $sampledMax implausibly far below peak $exactPeak")
  }

  test("psiDriftStream: closed-window PSI equals the batch replay; both alert polarities fire") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // frozen baseline: 80 values spread uniformly over buckets 0..3
    // (value v → bucket round(v*100) div 500: 0.5→0, 5.5→1, 10.5→2, 15.5→3)
    val baseVals = Seq.tabulate(80)(i => (i % 4) * 5.0 + 0.5)
    val baseline = Events.valueBucketHistogram(baseVals.toDF("value"))
    val mem = MemoryStream[(Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
    val q = Events.psiDriftStream(df, baseline).writeStream
      .format("memory").queryName("psi_mon").outputMode(OutputMode.Append).start()
    def ev(m: String, v: Double) = (Timestamp.valueOf(s"2024-01-01 $m:00"), v)
    // window 10:00 IN-PROFILE: 40 events with exactly the baseline mix —
    // with +1 smoothing over the shared 4-bucket domain both p=(10+1)/44
    // and p0=(20+1)/84 are exactly 0.25, so psi is exactly 0.
    // window 11:00 DRIFTED: all mass in bucket 3.
    // Fed across THREE batches so the (window, bucket) counts must
    // accumulate incrementally in the state store before closing.
    val inProfile = Seq.tabulate(40)(i => ev(f"10:${i % 50}%02d", (i % 4) * 5.0 + 0.5))
    val drifted = Seq.tabulate(40)(i => ev(f"11:${i % 50}%02d", 15.5))
    mem.addData(inProfile.take(20): _*); q.processAllAvailable()
    mem.addData(inProfile.drop(20) ++ drifted.take(15): _*); q.processAllAvailable()
    mem.addData(drifted.drop(15): _*); q.processAllAvailable()
    // sentinel far past the 2h watermark closes both real windows
    mem.addData(ev("16:00", 0.5)); q.processAllAvailable()
    q.stop()
    val out = spark.table("psi_mon").collect()
      .map(r => r.getAs[Timestamp]("win_start").toString.take(13) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("psi"),
          r.getAs[String]("status"), r.getAs[Boolean]("alert"))).toMap
    assert(out.keySet == Set("2024-01-01 10", "2024-01-01 11"),
      s"exactly the two watermark-closed windows must emit: $out")
    // batch replay on the SAME rows must agree exactly per closed window
    val allRows = (inProfile ++ drifted).toDF("ts", "value")
    val batch = Events.psiAgainstBaseline(allRows, baseline).collect()
      .map(r => r.getAs[Timestamp]("win_start").toString.take(13) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("psi"),
          r.getAs[String]("status"), r.getAs[Boolean]("alert"))).toMap
    assert(out == batch, s"streamed $out != batch $batch")
    // both polarities: the in-profile window is exactly 0 and quiet,
    // the drifted window pages
    assert(out("2024-01-01 10") == ((40L, 0.0, "ok", false)), s"$out")
    val (nDrift, psiDrift, statusDrift, alertDrift) = out("2024-01-01 11")
    assert(nDrift == 40L && psiDrift > 0.25 && statusDrift == "alert" && alertDrift,
      s"drifted window must alert: ${out("2024-01-01 11")}")
  }
}
