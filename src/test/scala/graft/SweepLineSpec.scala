package graft

import org.apache.spark.sql.functions._

/** Dense replays for the sweep-line pair: q178 interval union per user
  * and q179 global peak concurrency (whose Spark plan is the two-level
  * prefix sum — this spec replays the SINGLE-sweep definition and so
  * also proves the decomposition lossless).
  */
class SweepLineSpec extends SparkSpec {

  private val Len = 1800000000L // 30 min in µs

  private lazy val events: Array[(Long, Long)] =
    Tables.events(spark, sfDir).select("user_id", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("q178 replay: per-user union length via direct interval merge") {
    val perUser = events.groupBy(_._1).map { case (u, es) =>
      val ivs = es.map(e => (e._2, e._2 + Len)).sortBy(identity)
      var covered = 0L
      var reach = Long.MinValue
      ivs.foreach { case (s, e) =>
        covered += math.max(0L, e - math.max(s, if (reach == Long.MinValue) s else reach))
        reach = math.max(reach, e)
      }
      u -> covered
    }
    val hist = perUser.values.groupBy(_ / 3600000000L)
      .map { case (h, vs) => h -> (vs.size.toLong, vs.sum) }
    val rows = operators.Relational.q178.fn(spark, sfDir).collect()
    assert(rows.length == hist.size)
    rows.foreach { r =>
      val h = r.getAs[Long]("covered_hours")
      val (n, tot) = hist(h)
      assert(r.getAs[Long]("n_users") == n, s"bucket $h users")
      assert(r.getAs[Long]("total_covered_us") == tot, s"bucket $h total")
    }
    // union length never exceeds sum of durations, and is positive
    val totalCovered = rows.map(_.getAs[Long]("total_covered_us")).sum
    assert(totalCovered > 0 && totalCovered <= events.length.toLong * Len)
    // overlaps must exist in this corpus, else the operator is vacuous
    assert(totalCovered < events.length.toLong * Len,
      "expected overlapping intervals (union < sum of durations)")
  }

  test("q179 replay: single-sweep peak equals the two-level plan's answer") {
    val bounds = events.flatMap(e => Seq((e._2, 1), (e._2 + Len, -1)))
      .sortBy(identity) // (t asc, d asc) => closes before opens at ties
    var run = 0L
    var peak = 0L
    var firstPeakT = Long.MaxValue
    // group ties on (t, d): RANGE frame semantics give peers one value
    bounds.groupBy(identity).toSeq.sortBy(_._1).foreach { case ((t, d), g) =>
      run += d.toLong * g.length
      if (run > peak) { peak = run; firstPeakT = t }
    }
    val r = operators.Relational.q179.fn(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("peak_concurrency") == peak, "peak mismatch")
    assert(r.head.getAs[Long]("first_peak_us") == firstPeakT, "first-peak instant")
    assert(peak >= 1)
  }

  test("q190 CUSUM replay: integer argmax and the before/after means") {
    val hours = events.map(_._2 / 3600000000L)
      .groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
      .toSeq.sortBy(_._1)
    val k = hours.length.toLong
    val tot = hours.map(_._2).sum
    var cusum = 0L
    var cumN = 0L
    var best = -1L
    var cp = (0L, 0L, 0L, 0L) // hr, cusum, cum_n, pos
    hours.zipWithIndex.foreach { case ((hr, n), i) =>
      cusum += k * n - tot
      cumN += n
      if (math.abs(cusum) > best) { best = math.abs(cusum); cp = (hr, cusum, cumN, i + 1L) }
    }
    val r = operators.Relational.q190.fn(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_hours") == k && row.getAs[Long]("n_events") == tot)
    assert(row.getAs[Long]("changepoint_us") == cp._1 * 3600000000L, "cp instant")
    assert(row.getAs[Long]("cusum_scaled") == cp._2, "scaled cusum")
    assert(math.abs(row.getAs[Double]("magnitude")
      - best.toDouble / (k.toDouble * tot)) < 1e-6)
    assert(math.abs(row.getAs[Double]("mean_before")
      - cp._3.toDouble / cp._4) < 1e-6)
    assert(math.abs(row.getAs[Double]("mean_after")
      - (tot - cp._3).toDouble / (k - cp._4)) < 1e-6)
    // the statistic is meaningful: a real partition point strictly
    // inside the series
    assert(cp._4 >= 1 && cp._4 < k)
  }

  test("q191 decomposition replay: centered trend, seasonal means, residual RMS") {
    val hours = events.map(_._2 / 3600000000L)
      .groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
      .toSeq.sortBy(_._1)
    val n = hours.map(_._2.toDouble).toArray
    val trend = n.indices.map { i =>
      val lo = math.max(0, i - 12); val hi = math.min(n.length - 1, i + 12)
      val w = (lo to hi).map(n(_))
      w.sum / w.length
    }
    val byHod = hours.zipWithIndex.groupBy { case ((hr, _), _) => hr % 24 }
    val seasonal = byHod.map { case (hod, xs) =>
      val det = xs.map { case ((_, cnt), i) => cnt.toDouble - trend(i) }
      hod -> BigDecimal(det.sum / det.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = operators.Relational.q191.fn(spark, sfDir).collect()
    assert(rows.length == byHod.size)
    rows.foreach { r =>
      val hod = r.getAs[Long]("hod")
      assert(r.getAs[Long]("n_obs") == byHod(hod).size.toLong)
      assert(math.abs(r.getAs[Double]("seasonal") - seasonal(hod)) < 2e-6, s"hod $hod seasonal")
      val resid = byHod(hod).map { case ((_, cnt), i) =>
        val d = cnt.toDouble - trend(i) - seasonal(hod); d * d
      }
      val rms = math.sqrt(resid.sum / resid.length)
      assert(math.abs(r.getAs[Double]("resid_rms") - rms) < 2e-6, s"hod $hod rms")
    }
    // decomposition sanity: seasonal components roughly cancel (they are
    // means of detrended values whose global mean is ~0)
    val sMean = seasonal.values.sum / seasonal.size
    assert(math.abs(sMean) < 1.0, s"seasonal components off-center: $sMean")
  }

  test("q192 backtest replay: integer lag errors, MAEs, and the skill ratio") {
    val hours = events.map(_._2 / 3600000000L)
      .groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
      .toSeq.sortBy(_._1).map(_._2)
    var eNaive = 0L
    var eSeasonal = 0L
    var scored = 0L
    for (i <- 24 until hours.length) {
      scored += 1
      eNaive += math.abs(hours(i) - hours(i - 1))
      eSeasonal += math.abs(hours(i) - hours(i - 24))
    }
    val r = operators.Relational.q192.fn(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_scored") == scored)
    assert(row.getAs[Long]("abs_err_naive") == eNaive, "naive abs err")
    assert(row.getAs[Long]("abs_err_seasonal") == eSeasonal, "seasonal abs err")
    assert(math.abs(row.getAs[Double]("mae_naive") - eNaive.toDouble / scored) < 1e-6)
    assert(math.abs(row.getAs[Double]("skill_vs_naive")
      - eNaive.toDouble / eSeasonal) < 1e-6)
    assert(scored > 0 && eSeasonal > 0)
  }
}
