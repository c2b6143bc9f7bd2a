package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Events

/** Streaming faces of the experimentation pre-gates (r12): srmStream
  * (q234's sample-ratio-mismatch chi-square per live exposure window)
  * and obfMonitorStream (q235's O'Brien–Fleming boundaries as a
  * configured-look live monitor). Each spec drives the monitor through
  * MemoryStream across multiple batches (state must accumulate before
  * the watermark closes), proves streamed == batch replay per closed
  * window/look, and fires BOTH alert polarities.
  */
class ExperimentStreamSpec extends SparkSpec {

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("srmStream: closed-window chi2 equals the batch replay; balanced quiet, biased pages") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = Events.srmStream(df).writeStream
      .format("memory").queryName("srm_mon").outputMode(OutputMode.Append).start()
    // window 10:00 BALANCED: user ids 0..39 — the arm hash splits even/odd
    // ids 20/20 exactly; each user also sends a duplicate exposure event,
    // which the per-window dedup must drop. window 11:00 BIASED: 30 users
    // all hashed into one arm (even ids → arm of id parity via the hash —
    // pick ids whose hash lands on arm 0).
    val armOf = (u: Long) => u % 1000003L * 2654435761L % 2L
    val balanced = (0L until 40L).flatMap(u =>
      Seq((ts(f"10:${(u % 50)}%02d"), u), (ts(f"10:${((u + 3) % 50)}%02d"), u)))
    assert(balanced.map(_._2).distinct.map(armOf).count(_ == 0L) == 20)
    val biasedIds = (0L until 4000L).filter(u => armOf(u) == 0L).take(30)
    val biased = biasedIds.map(u => (ts(f"11:${(u % 50)}%02d"), u))
    mem.addData(balanced.take(30): _*); q.processAllAvailable()
    mem.addData(balanced.drop(30) ++ biased.take(10): _*); q.processAllAvailable()
    mem.addData(biased.drop(10): _*); q.processAllAvailable()
    // sentinel far past the 2h watermark closes both windows
    mem.addData((ts("16:00"), 999999L)); q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Timestamp]("win_start").toString.take(13) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("chi2"), r.getAs[Boolean]("srm_flag")))
    val out = spark.table("srm_mon").collect().map(key).toMap
    assert(out.keySet == Set("2024-01-01 10", "2024-01-01 11"),
      s"exactly the two watermark-closed windows must emit: $out")
    // batch replay on the same rows must agree exactly per closed window
    val allRows = (balanced ++ biased).toDF("ts", "user_id")
    val batch = Events.srmPerWindow(allRows).collect().map(key).toMap
    assert(out == batch, s"streamed $out != batch $batch")
    // polarities: balanced 20/20 → chi2 0, quiet; 30/0 → chi2 30, pages
    assert(out("2024-01-01 10") == ((20L, 20L, 0.0, false)), s"$out")
    assert(out("2024-01-01 11") == ((30L, 0L, 30.0, true)), s"$out")
  }

  test("obfMonitorStream: closed-look cumulative z equals the batch replay; A/A quiet, real effect crosses") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val armOf = (u: Long) => u % 1000003L * 2654435761L % 2L
    val expStart = ts("00:00")
    val lookUs = 3600L * 1000000L // five 1-hour looks
    def run(name: String, rows: Seq[(Timestamp, Long, Int)]): Map[Long, (Long, Long, Double, Double, Boolean)] = {
      val mem = MemoryStream[(Timestamp, Long, Int)]
      val df = mem.toDF().toDF("ts", "user_id", "conv")
      val q = Events.obfMonitorStream(df, expStart, lookUs).writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append).start()
      val (a, b) = rows.splitAt(rows.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      // sentinel unit far past the last look's end + watermark closes all
      mem.addData((ts("09:00"), 999999L, 0)); q.processAllAvailable()
      q.stop()
      spark.table(name).collect().map(r => r.getAs[Long]("look") ->
        ((r.getAs[Long]("n_cum"), r.getAs[Long]("conv_cum"),
          r.getAs[Double]("z"), r.getAs[Double]("bound"),
          r.getAs[Boolean]("crossed")))).toMap
    }
    // units: 24 users per look window (12 per arm by hash), entry minute
    // spread inside the look's hour
    val ids = (0L until 100000L)
    val arm0 = ids.filter(armOf(_) == 0L).take(60)
    val arm1 = ids.filter(armOf(_) == 1L).take(60)
    def entry(look: Int, i: Int) = ts(f"0$look:${(i * 7) % 50}%02d")
    // A/A: both arms convert identically (every 3rd unit) — no crossing
    val aa = (0 until 5).flatMap { lk =>
      (0 until 12).flatMap { i =>
        Seq((entry(lk, i), arm0(lk * 12 + i), i % 3 match { case 0 => 1; case _ => 0 }),
          (entry(lk, i), arm1(lk * 12 + i), i % 3 match { case 0 => 1; case _ => 0 }))
      }
    }
    val outAA = run("obf_aa", aa)
    assert(outAA.keySet == Set(1L, 2L, 3L, 4L, 5L),
      s"all five looks must close and emit: $outAA")
    val batchAA = Events.obfPerLook(aa.toDF("ts", "user_id", "conv"),
      expStart, lookUs).collect().map(r => r.getAs[Long]("look") ->
        ((r.getAs[Long]("n_cum"), r.getAs[Long]("conv_cum"),
          r.getAs[Double]("z"), r.getAs[Double]("bound"),
          r.getAs[Boolean]("crossed")))).toMap
    assert(outAA == batchAA, s"streamed $outAA != batch $batchAA")
    assert(outAA.values.forall(!_._5), s"A/A must not cross: $outAA")
    // cumulative counts really accumulate: look 5 holds all 120 units
    assert(outAA(5L)._1 == 120L && outAA(1L)._1 == 24L, s"$outAA")
    // real effect: arm0 converts 100%, arm1 0% — the z blows past the
    // late-look boundaries (must cross by look 5; the early 4.56 boundary
    // is deliberately hard to cross, the OBF point)
    val eff = (0 until 5).flatMap { lk =>
      (0 until 12).flatMap { i =>
        Seq((entry(lk, i), arm0(lk * 12 + i), 1),
          (entry(lk, i), arm1(lk * 12 + i), 0))
      }
    }
    val outEff = run("obf_eff", eff)
    val batchEff = Events.obfPerLook(eff.toDF("ts", "user_id", "conv"),
      expStart, lookUs).collect().map(r => r.getAs[Long]("look") ->
        ((r.getAs[Long]("n_cum"), r.getAs[Long]("conv_cum"),
          r.getAs[Double]("z"), r.getAs[Double]("bound"),
          r.getAs[Boolean]("crossed")))).toMap
    assert(outEff == batchEff, s"streamed $outEff != batch $batchEff")
    assert(outEff(5L)._5, s"a 100%-vs-0% effect must cross by the final look: $outEff")
    // boundary schedule is the monotone OBF table
    assert((1L to 5L).map(outEff(_)._4) == Seq(4.561578674, 3.225523213,
      2.633628675, 2.280789337, 2.040))
  }
}
