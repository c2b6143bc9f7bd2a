package graft

import org.apache.spark.sql.functions._

/** Dense replays for the experimentation/estimation batch (q228–q232).
  *
  * Same protocol as R11StatsSpec: each replay recomputes the operator's
  * stated contract from raw rows via exact arithmetic (never through the
  * operator's own plan), so agreement proves the distributed decomposition
  * — per-unit cents aggregates, bounded-table moments, integer-ceil decile
  * cuts — lossless, not merely self-consistent.
  */
class ExperimentStatsSpec extends SparkSpec {

  private def cents(x: Double): Long = math.round(x * 100)

  test("q228 CUPED theta/rho2/adjusted means equal the dense replay; weighted adj means recover the global mean") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) % 2, cents(r.getDouble(2))))
    val perUnit = rows.groupBy(_._1).map { case (ck, g) =>
      val x = g.filter(_._2 == 0L).map(_._3).sum
      val y = g.filter(_._2 == 1L).map(_._3).sum
      (ck % 1000003L * 2654435761L % 2L, BigInt(x), BigInt(y))
    }.toSeq
    val n = perUnit.size.toDouble
    val tsx = perUnit.map(_._2).sum
    val tsy = perUnit.map(_._3).sum
    val tsxx = perUnit.map(t => t._2 * t._2).sum
    val tsyy = perUnit.map(t => t._3 * t._3).sum
    val tsxy = perUnit.map(t => t._2 * t._3).sum
    val covN = n * tsxy.toDouble - tsx.toDouble * tsy.toDouble
    val varxN = n * tsxx.toDouble - tsx.toDouble * tsx.toDouble
    val varyN = n * tsyy.toDouble - tsy.toDouble * tsy.toDouble
    val theta = covN / varxN
    val rho2 = covN * covN / (varxN * varyN)
    val got = operators.Relational.q228.fn(spark, sfDir)
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    assert(got.size == 2, "two arms expected")
    var wAdjSum = 0.0
    Seq(0L, 1L).foreach { arm =>
      val g = perUnit.filter(_._1 == arm)
      val nu = g.size.toDouble
      val meanRaw = g.map(_._3).sum.toDouble / nu / 100
      val meanAdj = (g.map(_._3).sum.toDouble / nu
        - theta * (g.map(_._2).sum.toDouble / nu - tsx.toDouble / n)) / 100
      val row = got(arm)
      assert(row.getAs[Long]("n_u") == g.size)
      assert(math.abs(row.getAs[Double]("mean_raw") - meanRaw) < 1e-4)
      assert(math.abs(row.getAs[Double]("mean_adj") - meanAdj) < 1e-4)
      assert(math.abs(row.getAs[Double]("theta") - theta) < 1e-5)
      assert(math.abs(row.getAs[Double]("rho2") - rho2) < 1e-5)
      wAdjSum += nu * meanAdj
    }
    // Σ_a n_a·(x̄_a − x̄) = 0, so the n-weighted adjusted means must
    // recover the global raw mean exactly — the unbiasedness identity
    assert(math.abs(wAdjSum / n - tsy.toDouble / n / 100) < 1e-6,
      "weighted adjusted means must average to the global mean")
    assert(rho2 >= 0 && rho2 <= 1, s"rho2 out of range: $rho2")
    // A/A: the hash split is a null contrast — the ADJUSTED difference
    // must not exceed the raw difference by more than noise allows
    val rawDiff = math.abs(got(0L).getAs[Double]("mean_raw")
      - got(1L).getAs[Double]("mean_raw"))
    val adjDiff = math.abs(got(0L).getAs[Double]("mean_adj")
      - got(1L).getAs[Double]("mean_adj"))
    assert(adjDiff < rawDiff + 1e-6 || adjDiff < 0.05 * (tsy.toDouble / n / 100),
      s"CUPED adjustment moved a null contrast outward: raw=$rawDiff adj=$adjDiff")
  }

  test("q229 EB shrinkage equals the dense replay and every shrunk rate sits between raw and prior") {
    val rows = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("o_orderpriority"))
      .collect().map(r => (r.getInt(0), if (r.getString(1) == "1-URGENT") 1L else 0L))
    val byNation = rows.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val k = byNation.size
    val tn = byNation.values.map(_._1).sum
    val tu = byNation.values.map(_._2).sum
    // the operator quantizes each rate onto the 1e-12 grid before the sum
    val sp = byNation.values
      .map { case (nn, u) => math.round(1e12 * (u.toDouble / nn)) }
      .sum.toDouble / 1e12
    val pbar = sp / k
    val ssq = byNation.values
      .map { case (nn, u) =>
        val dlt = u.toDouble / nn - pbar
        math.round(1e12 * dlt * dlt)
      }.sum.toDouble / 1e12
    val mm = BigDecimal(math.max(0.0, pbar * (1 - pbar) * (k - 1) / ssq - 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val prior = tu.toDouble / tn
    val got = operators.Relational.q229.fn(spark, sfDir)
      .collect().map(r => r.getAs[Int]("nation") -> r).toMap
    assert(got.size == k)
    byNation.foreach { case (nat, (nn, u)) =>
      val row = got(nat)
      val raw = u.toDouble / nn
      val shrunk = (u.toDouble + mm * prior) / (nn.toDouble + mm)
      assert(row.getAs[Long]("n") == nn)
      assert(row.getAs[Double]("rate_raw") == raw)
      assert(math.abs(row.getAs[Double]("rate_shrunk") - shrunk) < 1e-5,
        s"nation $nat shrunk: $shrunk vs ${row.getAs[Double]("rate_shrunk")}")
      assert(math.abs(row.getAs[Double]("prior_strength") - mm) < 1e-5)
      // betweenness: shrinkage interpolates, never extrapolates
      val lo = math.min(raw, prior) - 1e-9
      val hi = math.max(raw, prior) + 1e-9
      val sv = row.getAs[Double]("rate_shrunk")
      assert(sv >= lo && sv <= hi,
        s"nation $nat shrunk rate $sv outside [$lo, $hi]")
    }
    assert(mm > 0, "between-group spread exists, so the prior must have weight")
  }

  test("q230 TOST z-statistics equal the dense replay and the A/A split concludes equivalence") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0) % 2 == 0, BigInt(cents(r.getDouble(1)))))
    def mom(p: Boolean) = {
      val g = rows.filter(_._1 == p).map(_._2)
      val nn = g.size.toDouble
      val s1 = g.sum.toDouble
      val s2 = g.map(c => c * c).sum.toDouble
      (nn, s1 / nn, (g.size.toDouble * s2 - s1 * s1) / (nn * (nn - 1)))
    }
    val (na, ma, va) = mom(true)
    val (nb, mb, vb) = mom(false)
    val diff = ma - mb
    val se = math.sqrt(va / na + vb / nb)
    val zLo = (diff + 5000000) / se
    val zHi = (5000000 - diff) / se
    val got = operators.Relational.q230.fn(spark, sfDir).collect().head
    assert(got.getAs[Long]("n_a") == na.toLong)
    assert(got.getAs[Long]("n_b") == nb.toLong)
    assert(math.abs(got.getAs[Double]("diff_dollars") - diff / 100) < 1e-4)
    assert(math.abs(got.getAs[Double]("z_lower") - zLo) < 1e-5)
    assert(math.abs(got.getAs[Double]("z_upper") - zHi) < 1e-5)
    // A/A with a $50k margin on a ~$7.5k se: both one-sided tests must pass
    assert(got.getAs[Boolean]("equivalent"),
      s"A/A TOST failed to conclude equivalence: zLo=$zLo zHi=$zHi")
    assert(math.abs(diff) < 1250000, s"A/A diff exceeded delta/4: $diff")
  }

  test("q231 MDE and required-n equal the dense replay off q167's funnel") {
    val f = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("tc"))
      .collect().map { r =>
        val conv = !r.isNullAt(2) && r.getLong(2) <= r.getLong(1) + 3600000000L
        (r.getLong(0) % 1000003L * 2654435761L % 2L, if (conv) 1L else 0L)
      }
    val na = f.count(_._1 == 0L).toDouble
    val nb = f.count(_._1 == 1L).toDouble
    val convT = f.map(_._2).sum
    val pbar = convT / (na + nb)
    val zsum = 1.959963985 + 0.841621234
    val got = operators.Relational.q231.fn(spark, sfDir).collect().head
    assert(got.getAs[Long]("n_a") == na.toLong)
    assert(got.getAs[Long]("n_b") == nb.toLong)
    if (convT > 0 && convT < na + nb) {
      val mde = zsum * math.sqrt(pbar * (1 - pbar) * (1 / na + 1 / nb))
      val nReq = math.ceil(zsum * zsum * 2 * pbar * (1 - pbar)
        / (0.1 * pbar * 0.1 * pbar)).toLong
      assert(math.abs(got.getAs[Double]("mde_abs") - mde) < 1e-5)
      assert(got.getAs[Long]("n_per_arm_10pct") == nReq)
      assert(mde > 0 && nReq > 0)
    } else {
      assert(got.getAs[Double]("mde_abs") == 0.0)
      assert(got.getAs[Long]("n_per_arm_10pct") == 0L)
    }
  }

  test("q233 pinball losses equal the dense integer replay; P90 covers at least as often as P50") {
    val hours = Tables.events(spark, sfDir)
      .groupBy(expr("ts_us div 3600000000").as("hr"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = hours.map(_._1 / 24)
    val dmid = (days.min + days.max + 1) / 2
    val train = hours.filter(_._1 / 24 < dmid)
    val test0 = hours.filter(_._1 / 24 >= dmid)
    def quant(hod: Long, num: Int, den: Int): Long = {
      val xs = train.filter(_._1 % 24 == hod).map(_._2).sorted
      // integer-ceil rank rule: smallest x with den·rank ≥ num·n
      xs(((xs.length * num + den - 1) / den - 1).max(0))
    }
    val q50 = (0L to 23L).map(h => h -> quant(h, 1, 2)).toMap
    val q90 = (0L to 23L).map(h => h -> quant(h, 9, 10)).toMap
    var p1050, p1090, cov50, cov90 = 0L
    test0.foreach { case (hr, n) =>
      val (a, b) = (q50(hr % 24), q90(hr % 24))
      p1050 += 5 * math.abs(n - a)
      p1090 += (if (n >= b) 9 * (n - b) else b - n)
      if (n <= a) cov50 += 1
      if (n <= b) cov90 += 1
    }
    val got = operators.Relational.q233.fn(spark, sfDir).collect().head
    assert(got.getAs[Long]("n_test") == test0.length)
    assert(got.getAs[Long]("pinball10_50") == p1050, "P50 pinball mismatch")
    assert(got.getAs[Long]("pinball10_90") == p1090, "P90 pinball mismatch")
    assert(got.getAs[Double]("coverage_50") == cov50.toDouble / test0.length)
    assert(got.getAs[Double]("coverage_90") == cov90.toDouble / test0.length)
    // a P90 forecast must cover no less often than the P50 one, and with
    // stationary arrivals its coverage should actually look like a high
    // quantile rather than a median
    assert(got.getAs[Double]("coverage_90") >= got.getAs[Double]("coverage_50"))
    assert(got.getAs[Double]("coverage_90") > 0.5,
      s"P90 coverage degenerate: ${got.getAs[Double]("coverage_90")}")
  }

  test("q234 SRM chi-squares equal the dense replay and the balanced hash split never alarms") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val segs = rows.flatMap { case (t, u) => Seq(("__all__", u), (t, u)) }
      .distinct.groupBy(_._1)
    val got = operators.Relational.q234.fn(spark, sfDir)
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    assert(got.size == segs.size)
    segs.foreach { case (seg, us) =>
      val na = us.count(t => t._2 % 1000003L * 2654435761L % 2L == 0L)
      val nb = us.size - na
      val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
      val row = got(seg)
      assert(row.getAs[Long]("n_a") == na, s"$seg n_a")
      assert(row.getAs[Long]("n_b") == nb, s"$seg n_b")
      assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-5, s"$seg chi2")
      // the deterministic hash assignment is balanced — a designed A/A
      // split must never trip the SRM alarm, in any segment
      assert(!row.getAs[Boolean]("srm_flag"), s"SRM fired on A/A seg $seg")
    }
  }

  test("q235 group-sequential z path equals the dense replay and no OBF look crosses on the A/A") {
    val users = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(expr("min(ts_us) div 86400000000").as("d0"),
        when(min(when(col("event_type") === "purchase", col("ts_us")))
          <= min(col("ts_us")) + 3600000000L, 1).otherwise(0).as("conv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val dmin = users.map(_._2).min
    val dmax = users.map(_._2).max
    def look(d0: Long): Long =
      math.min(4L, 5 * (d0 - dmin) / (dmax - dmin + 1)) + 1
    val bounds = Map(1L -> 4.561578674, 2L -> 3.225523213,
      3L -> 2.633628675, 4L -> 2.280789337, 5L -> 2.040)
    val byLook = users.groupBy(u => look(u._2))
    val looks = byLook.keys.toSeq.sorted
    val got = operators.Relational.q235.fn(spark, sfDir)
      .collect().map(r => r.getAs[Long]("look") -> r).toMap
    assert(got.size == looks.size)
    looks.foreach { lx =>
      val cumUsers = users.filter(u => look(u._2) <= lx)
      val a = cumUsers.filter(_._1 % 1000003L * 2654435761L % 2L == 0L)
      val bSide = cumUsers.filter(_._1 % 1000003L * 2654435761L % 2L == 1L)
      val (na, nb) = (a.size.toDouble, bSide.size.toDouble)
      val (ca, cb) = (a.map(_._3).sum.toDouble, bSide.map(_._3).sum.toDouble)
      val z =
        if (ca + cb == 0 || ca + cb == na + nb) 0.0
        else {
          val p = (ca + cb) / (na + nb)
          (ca / na - cb / nb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
        }
      val row = got(lx)
      assert(row.getAs[Long]("n_cum") == cumUsers.size, s"look $lx n_cum")
      assert(math.abs(row.getAs[Double]("z") - z) < 1e-5, s"look $lx z")
      assert(row.getAs[Double]("bound") == bounds(lx))
      // a null contrast must never cross an OBF boundary (that is the
      // whole point of the spending schedule)
      assert(!row.getAs[Boolean]("crossed"), s"A/A crossed at look $lx: z=$z")
      assert(math.abs(z) < 6, s"A/A |z| blew the 6-sigma null bar: $z")
    }
  }

  test("q237 quantile treatment effects equal the dense integer replay and the A/A stays near zero") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
      .collect().map(r =>
        (r.getLong(0) % 1000003L * 2654435761L % 2L, cents(r.getDouble(1)) / 1000))
    def quant(arm: Long, num: Int, den: Int): Long = {
      val xs = rows.filter(_._1 == arm).map(_._2).sorted
      xs(((xs.length * num + den - 1) / den - 1).max(0))
    }
    val grid = Seq((25L, 1, 4), (50L, 1, 2), (75L, 3, 4), (90L, 9, 10))
    val got = operators.Relational.q237.fn(spark, sfDir)
      .collect().map(r => r.getAs[Long]("quantile") -> r).toMap
    assert(got.size == 4)
    val pooled = rows.map(_._2).sorted
    val na = rows.count(_._1 == 0L).toDouble
    val nb = rows.count(_._1 == 1L).toDouble
    grid.foreach { case (q, num, den) =>
      val (va, vb) = (quant(0L, num, den), quant(1L, num, den))
      val row = got(q)
      assert(row.getAs[Long]("vb_a") == va, s"p$q arm A")
      assert(row.getAs[Long]("vb_b") == vb, s"p$q arm B")
      assert(row.getAs[Long]("qte_buckets") == va - vb, s"p$q QTE")
      // null contrast, distribution-free bar: a two-sample quantile
      // difference at level q deviates by at most ~6 standard errors in
      // PROBABILITY space; convert that band through the pooled empirical
      // quantile function (no density assumption — the q167 A/A
      // convention applied to order statistics)
      val frac = num.toDouble / den
      val se = math.sqrt(frac * (1 - frac) * (1 / na + 1 / nb))
      def pooledQ(f: Double): Long =
        pooled((math.ceil(pooled.length * f).toInt - 1).max(0)
          .min(pooled.length - 1))
      val band = pooledQ((frac + 6 * se).min(1.0)) - pooledQ((frac - 6 * se).max(0.0))
      assert(math.abs(va - vb) <= band.max(1L),
        s"A/A QTE blew the 6-sigma band at p$q: ${va - vb} vs band $band")
    }
    assert(got(25L).getAs[Long]("n_a") == rows.count(_._1 == 0L))
    assert(got(25L).getAs[Long]("n_b") == rows.count(_._1 == 1L))
  }

  test("q238 PAV fit equals the independent minimax characterization; monotone and mass-conserving") {
    val raw = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_totalprice"), col("o_orderpriority"))
      .collect().map(r =>
        (cents(r.getDouble(0)) / 10000, if (r.getString(1) == "1-URGENT") 1L else 0L))
    val byVb = raw.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (vb, g) => (vb, g.size.toLong, g.map(_._2).sum) }
    val ns = byVb.map(_._2)
    val us = byVb.map(_._3)
    val m = byVb.length
    // independent derivation: the isotonic L2 fit at position i is the
    // minimax of segment means, fitted_i = max_{s<=i} min_{t>=i} mean(s..t)
    val prefN = ns.scanLeft(0L)(_ + _)
    val prefU = us.scanLeft(0L)(_ + _)
    def mean(s: Int, t: Int): Double =
      (prefU(t + 1) - prefU(s)).toDouble / (prefN(t + 1) - prefN(s))
    val minimax = (0 until m).map { i =>
      (0 to i).map { s =>
        (i until m).map(t => mean(s, t)).min
      }.max
    }

    val got = ml.MlPrep.q238.fn(spark, sfDir).orderBy("block").collect()
    // blocks tile the bucket axis and conserve mass
    assert(got.map(_.getAs[Long]("n_orders")).sum == ns.sum)
    assert(got.map(_.getAs[Long]("n_urgent")).sum == us.sum)
    val rates = got.map(_.getAs[Double]("rate_fitted")).toSeq
    assert(rates.zip(rates.tail).forall { case (a, b) => a < b },
      s"PAV block rates must be strictly increasing: $rates")
    // per-bucket fitted value (its block's rate) matches the minimax form
    val fitted = byVb.map { case (vb, _, _) =>
      val b = got.find(r =>
        r.getAs[Long]("vb_from") <= vb && vb <= r.getAs[Long]("vb_to")).get
      b.getAs[Double]("rate_fitted")
    }
    fitted.zip(minimax).zipWithIndex.foreach { case ((f, mm), i) =>
      assert(math.abs(f - mm) < 1e-9,
        s"bucket ${byVb(i)._1}: PAV $f vs minimax $mm")
    }
  }

  test("q239 probe weights match an independent eigendecomposition solve; accuracies replay exactly") {
    val data = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>"), col("label"))
      .collect().map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    val dim = 64
    val aug = dim + 1
    val k = data.map(_._2).max + 1
    // exact sufficient statistics on the driver
    val xtx = Array.ofDim[Double](aug, aug)
    val xty = Array.ofDim[Double](aug, k)
    data.foreach { case (x0, y) =>
      val x = x0 :+ 1.0
      for (i <- 0 until aug) {
        for (j <- 0 until aug) xtx(i)(j) += x(i) * x(j)
        xty(i)(y) += x(i)
      }
    }
    val a = Array.tabulate(aug, aug)((i, j) => xtx(i)(j) + (if (i == j) 1.0 else 0.0))
    // INDEPENDENT solve route: A⁻¹ via the Jacobi eigendecomposition the
    // whitening module ships (different algorithm from the operator's
    // Gaussian elimination)
    val (lam, v) = ml.Whitening.jacobiEigen(a)
    def solveEig(b: Array[Double]): Array[Double] = {
      val y = Array.tabulate(aug)(e =>
        (0 until aug).map(i => v(i)(e) * b(i)).sum / lam(e))
      Array.tabulate(aug)(i => (0 until aug).map(e => v(i)(e) * y(e)).sum)
    }
    val wExpect = Array.tabulate(k)(c => solveEig(Array.tabulate(aug)(i => xty(i)(c))))
    val (wGot, kGot) = ml.Probe.fit(spark, sfDir)
    assert(kGot == k)
    for (c <- 0 until k; i <- 0 until aug)
      assert(math.abs(wGot(c)(i) - wExpect(c)(i)) < 1e-6,
        s"weight[$c][$i]: ${wGot(c)(i)} vs ${wExpect(c)(i)}")
    // per-class accuracy replay off the expected weights
    val expectAcc = data.groupBy(_._2).map { case (y, g) =>
      val correct = g.count { case (x0, yy) =>
        val x = x0 :+ 1.0
        val scores = (0 until k).map(c => (0 until aug).map(i => wExpect(c)(i) * x(i)).sum)
        scores.zipWithIndex.maxBy { case (sc, c) => (sc, -c) }._2 == yy
      }
      y -> (g.size.toLong, correct.toLong)
    }
    val got = ml.Probe.q239.fn(spark, sfDir).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_correct"))).toMap
    assert(got.size == k)
    expectAcc.foreach { case (y, (n, c)) =>
      assert(got(y)._1 == n, s"class $y support")
      assert(got(y)._2 == c, s"class $y correct: got ${got(y)._2}, expect $c")
    }
  }

  test("q232 gains deciles equal the dense replay; capture is monotone and decile 10 covers everything") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .collect().map { r =>
        (r.getLong(0) % 2 == 0, cents(r.getDouble(1)) / 10000,
          if (r.getString(2) == "1-URGENT") 1L else 0L)
      }
    val byVb = rows.groupBy(_._2).view.mapValues { g =>
      val tr = g.filter(_._1)
      val te = g.filterNot(_._1)
      (tr.size.toLong, tr.map(_._3).sum, te.size.toLong, te.map(_._3).sum)
    }.toMap
    val test0 = byVb.toSeq.filter(_._2._3 > 0)
      .map { case (vb, (ntr, utr, nte, ute)) =>
        (vb, nte, ute, (utr + 1).toDouble / (ntr + 2).toDouble)
      }
      .sortBy { case (vb, _, _, ph) => (-ph, vb) }
    val nn = test0.map(_._2).sum
    val uu = test0.map(_._3).sum
    val cum = test0.scanLeft((0L, 0L)) { case ((cn, cu), (_, nte, ute, _)) =>
      (cn + nte, cu + ute)
    }.tail
    val expected = (1 to 10).map { dd =>
      val (cn, cu) = cum.find { case (cn, _) => 10 * cn >= dd * nn }.get
      (dd.toLong, cn, cu, cu.toDouble / uu, cn.toDouble / nn,
        cu.toDouble * nn / (uu.toDouble * cn))
    }
    val got = ml.MlPrep.q232.fn(spark, sfDir).orderBy("decile").collect().toSeq
    assert(got.size == 10)
    expected.zip(got).foreach { case ((dd, cn, cu, cap, frac, lift), row) =>
      assert(row.getAs[Long]("decile") == dd)
      assert(row.getAs[Long]("n_cum") == cn, s"decile $dd n_cum")
      assert(row.getAs[Long]("u_cum") == cu, s"decile $dd u_cum")
      assert(math.abs(row.getAs[Double]("capture") - cap) < 1e-5)
      assert(math.abs(row.getAs[Double]("frac_acted") - frac) < 1e-5)
      assert(math.abs(row.getAs[Double]("lift") - lift) < 1e-5)
    }
    // decile d's capture can never shrink as d grows; decile 10 is the
    // whole test population at lift exactly 1
    val caps = got.map(_.getAs[Double]("capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(got.last.getAs[Double]("capture") == 1.0)
    assert(got.last.getAs[Double]("frac_acted") == 1.0)
    assert(got.last.getAs[Double]("lift") == 1.0)
  }
}
