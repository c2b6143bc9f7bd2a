package graft

import org.apache.spark.sql.functions._

/** Batch-2 round-8 operators: q153 Mahalanobis whitening (algebraic
  * identities — the exact bars an eigendecomp-backed rows-only operator
  * can offer), q154 directional containment (dense rerank replay),
  * q155 CV folds (hash replay), q156 JL projection (formula replay +
  * the distance-preservation property the sketch exists for).
  */
class ProjectionAuditSpec extends SparkSpec {

  test("jacobiEigen solves a known 2x2 and reconstructs the covariance") {
    val (lam, v) = ml.Whitening.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(lam.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // eigen columns orthonormal
    val dot01 = v(0)(0) * v(0)(1) + v(1)(0) * v(1)(1)
    assert(math.abs(dot01) < 1e-12)
  }

  test("q153 identities: mean maha_sq = dim, whitened coords have unit variance") {
    val rows = ml.Whitening.q153.fn(spark, sfDir).collect()
    val n = rows.length
    val meanMsq = rows.map(_.getAs[Double]("maha_sq")).sum / n
    assert(math.abs(meanMsq - 64.0) < 2e-3, s"mean maha_sq $meanMsq != 64")
    def stats(c: String): (Double, Double) = {
      val xs = rows.map(_.getAs[Double](c))
      val mu = xs.sum / n
      (mu, xs.map(x => (x - mu) * (x - mu)).sum / n)
    }
    val (mu1, var1) = stats("w1")
    val (mu2, var2) = stats("w2")
    assert(math.abs(mu1) < 1e-3 && math.abs(mu2) < 1e-3, s"whitened means $mu1 $mu2")
    assert(math.abs(var1 - 1.0) < 2e-3, s"var(w1) $var1")
    assert(math.abs(var2 - 1.0) < 2e-3, s"var(w2) $var2")
    val cov = rows.map(r => (r.getAs[Double]("w1") - mu1) * (r.getAs[Double]("w2") - mu2)).sum / n
    assert(math.abs(cov) < 2e-3, s"cov(w1,w2) $cov")
    val thresh = 64.0 + 3.0 * math.sqrt(128.0)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_outlier") == (r.getAs[Double]("maha_sq") > thresh))
      assert(r.getAs[Double]("maha_sq") >= 0.0)
    }
  }

  test("q154 containment rows verify against raw gram sets") {
    val rows = dedup.Dedup.q154.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ids = rows.flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val texts = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] =
      (0 to t.length - 3).map(i => t.substring(i, i + 3)).toSet
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val (ga, gb) = (grams(texts(a)), grams(texts(b)))
      val inter = ga.intersect(gb).size.toLong
      assert(r.getAs[Long]("inter") == inter, s"pair ($a,$b) inter")
      assert(r.getAs[Long]("n_a") == ga.size.toLong)
      assert(r.getAs[Long]("n_b") == gb.size.toLong)
      assert(math.abs(r.getAs[Double]("cont_a") - inter.toDouble / ga.size) < 1e-12)
      assert(math.abs(r.getAs[Double]("cont_b") - inter.toDouble / gb.size) < 1e-12)
      // containment dominates Jaccard by construction
      val jac = inter.toDouble / ga.union(gb).size
      assert(r.getAs[Double]("cont_a") >= jac - 1e-12)
      assert(r.getAs[Double]("cont_b") >= jac - 1e-12)
    }
    // ranked by the max direction, descending
    val gmax = rows.map(r => math.max(r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b")))
    assert(gmax.zip(gmax.tail).forall { case (x, y) => x >= y - 1e-12 })
  }

  test("q155 folds match the hash formula; counts conserve") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val folds = vecs.groupBy { case (id, _) => id % 1000003L * 2654435761L % 5L }
    val rows = ml.MlPrep.q155.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == vecs.length.toLong)
    rows.foreach { r =>
      val f = r.getAs[Long]("fold")
      val g = folds(f)
      assert(r.getAs[Long]("n") == g.length.toLong, s"fold $f size")
      assert(r.getAs[Long]("n_labels") == g.map(_._2).distinct.length.toLong)
      val dev = r.getAs[Double]("max_dev")
      assert(dev >= 0.0 && dev <= 1.0)
      // folds of a hash split should track the global label mix closely
      assert(dev < 0.2, s"fold $f max_dev $dev implausibly unbalanced")
    }
  }

  test("q157 per-dim drift matches a dense split replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (a, b) = vecs.partition { case (id, _) => id % 1000003L * 2654435761L % 10L < 7L }
    def meanDim(g: Array[(Long, Array[Float])], i: Int): Double =
      g.map(_._2(i).toDouble).sum / g.length
    val rows = ml.Whitening.q157.fn(spark, sfDir).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val i = r.getAs[Int]("dim") - 1
      assert(math.abs(r.getAs[Double]("mean_a") - meanDim(a, i)) < 1e-5)
      assert(math.abs(r.getAs[Double]("mean_b") - meanDim(b, i)) < 1e-5)
      assert(math.abs(r.getAs[Double]("delta")
        - (meanDim(a, i) - meanDim(b, i))) < 1e-5)
      assert(r.getAs[Boolean]("drifted") ==
        (math.abs(r.getAs[Double]("delta")) > 0.05))
    }
    // same-corpus hash split: per-dim means must agree closely — large
    // deltas here would mean the operator (not the data) drifts
    assert(rows.count(_.getAs[Boolean]("drifted")) < 16,
      "hash split of one corpus reads as drifted")
  }

  test("q158 recall curve: monotone in nProbe, exactly 1.0 at full probe") {
    val rows = sim.Similarity.q158.fn(spark, sfDir).collect()
    assert(rows.length >= 2)
    val nq = rows.map(_.getAs[Long]("n_queries")).distinct
    assert(nq.length == 1 && nq.head > 0, "query count varies across levels")
    val means = rows.map(r =>
      (r.getAs[Int]("n_probe"), r.getAs[Double]("mean_recall")))
    assert(means.map(_._1).sorted.toSeq == means.map(_._1).toSeq)
    means.zip(means.tail).foreach { case ((p1, r1), (p2, r2)) =>
      assert(r2 >= r1 - 1e-9, s"recall fell $r1@$p1 -> $r2@$p2")
    }
    // probing every cell IS the exact scan under the same tie order
    assert(means.last._2 == 1.0, s"full-probe recall ${means.last._2}")
    assert(rows.last.getAs[Double]("min_recall") == 1.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_recall") <= r.getAs[Double]("mean_recall") + 1e-9)
      assert(r.getAs[Double]("mean_recall") <= 1.0 + 1e-9)
    }
  }

  test("q163 layout audit: sort wins its own dimension, curves bound both") {
    val rows = operators.Relational.q163.fn(spark, sfDir).collect()
    assert(rows.length == 6)
    val hit = rows.map(r => (r.getAs[String]("layout"), r.getAs[String]("probe"))
      -> r.getAs[Long]("files_hit")).toMap
    assert(rows.forall(_.getAs[Long]("files") == 16L))
    // arrival order (≈ time order) cannot prune the user probe AT ALL —
    // every file spans essentially all users
    assert(hit(("natural", "user_band")) == 16L,
      s"natural user probe ${hit(("natural", "user_band"))}")
    // ...which is exactly what the curves fix
    assert(hit(("hilbert", "user_band")) < 16L)
    assert(hit(("morton", "user_band")) < 16L)
    // and the single-dim sort dominates its own dimension
    assert(hit(("natural", "time_band")) <= hit(("hilbert", "time_band")))
    assert(hit(("natural", "time_band")) <= hit(("morton", "time_band")))
    // Hilbert's adjacency-preserving walk is never worse than Morton
    // across the probe pair (the center-seam pathology)
    val hTot = hit(("hilbert", "time_band")) + hit(("hilbert", "user_band"))
    val mTot = hit(("morton", "time_band")) + hit(("morton", "user_band"))
    assert(hTot <= mTot, s"hilbert total $hTot vs morton $mTot")
    rows.foreach { r =>
      val frac = r.getAs[Double]("hit_fraction")
      assert(frac > 0.0 && frac <= 1.0)
      assert(math.abs(frac - r.getAs[Long]("files_hit").toDouble / 16) < 1e-9)
    }
  }

  test("q164 sketch quantiles honor the 2/accuracy merged rank bound; error shrinks with accuracy") {
    val rows = operators.Relational.q164.fn(spark, sfDir).collect()
    assert(rows.length == 30, s"expected 5 groups x 2 quantiles x 3 accuracies")
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      "sketch violated the merged-summary rank guarantee (2/accuracy)")
    // at spec scale the NOMINAL 1/accuracy bound should also hold — the
    // 2x slack exists for high-fan-in merges (see q164's scaladoc)
    assert(rows.forall(r => r.getAs[Double]("rank_err") <=
      1.0 / r.getAs[Int]("accuracy") + 1e-12),
      "nominal 1/accuracy bound violated at spec scale")
    val byAcc = rows.groupBy(_.getAs[Int]("accuracy"))
      .map { case (a, g) => a -> g.map(_.getAs[Double]("rank_err")).sum / g.size }
    val sorted = byAcc.toSeq.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((a1, e1), (a2, e2)) =>
      assert(e2 <= e1 + 1e-12, s"mean rank_err rose $e1@$a1 -> $e2@$a2")
    }
    // the audit must SEE error at the coarse setting, else it tests nothing
    assert(byAcc(100) > 0.0, "accuracy=100 shows zero rank error — corpus too small to audit")
    // exact reference replay for one group
    val vals = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_totalprice").collect().map(_.getDouble(0)).sorted
    val p50 = vals(math.ceil(0.5 * vals.length).toInt - 1)
    val got = rows.find(r => r.getAs[String]("o_orderpriority") == "1-URGENT"
      && r.getAs[Double]("quantile") == 0.5).get.getAs[Double]("exact_disc")
    assert(got == p50, s"exact_disc $got vs dense $p50")
  }

  test("q165 Markov attribution: power-iteration parity, removal invariants") {
    val counts = operators.Relational.markovTransitionCounts(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // independent absorption estimate: iterate the distribution from
    // START through the chain (no linear solve) until mass settles
    def powerAbsorb(removed: Set[String]): Double = {
      val totals = counts.filterNot(c => removed(c._1)).groupBy(_._1)
        .map { case (f, g) => f -> g.map(_._3).sum.toDouble }
      var dist = Map("START" -> 1.0)
      var conv = 0.0
      (1 to 500).foreach { _ =>
        val next = scala.collection.mutable.Map[String, Double]()
        dist.foreach { case (st, m) =>
          if (m > 0 && totals.contains(st) && !removed(st)) {
            counts.filter(_._1 == st).foreach { case (_, t, n) =>
              val p = m * n / totals(st)
              if (t == "CONV") conv += p
              else if (t != "DROP" && !removed(t)) next(t) = next.getOrElse(t, 0.0) + p
            }
          }
        }
        dist = next.toMap
      }
      conv
    }
    val rows = operators.Relational.q165.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val pBase = rows.head.getAs[Double]("p_base")
    assert(math.abs(pBase - powerAbsorb(Set.empty)) < 1e-9,
      s"p_base $pBase vs power ${powerAbsorb(Set.empty)}")
    assert(pBase > 0.0 && pBase <= 1.0)
    var creditSum = 0.0
    rows.foreach { r =>
      val c = r.getAs[String]("channel")
      val pRem = r.getAs[Double]("p_removed")
      assert(math.abs(pRem - powerAbsorb(Set(c))) < 1e-9, s"channel $c")
      // cutting paths can only lose conversions (mass is not renormalized)
      assert(pRem <= pBase + 1e-12, s"$c: removal raised conversion")
      assert(r.getAs[Double]("removal_effect") >= -1e-12)
      creditSum += r.getAs[Double]("credit_share")
    }
    assert(math.abs(creditSum - 1.0) < 1e-9, s"credit shares sum $creditSum")
  }

  test("q166 life table matches a dense Kaplan-Meier replay") {
    val users = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("tc"),
        max("ts_us").as("tl"))
      .collect()
      .map { r =>
        val t0 = r.getLong(1)
        val conv = !r.isNullAt(2)
        val end = if (conv) r.getLong(2) else r.getLong(3)
        ((end - t0) / 3600000000L, conv)
      }
    val byHr = users.groupBy(_._1).map { case (h, g) =>
      h -> (g.count(_._2).toLong, g.count(!_._2).toLong)
    }
    val hrs = byHr.keys.toSeq.sorted
    var atRisk = users.length.toLong
    var surv = 1.0
    val dense = scala.collection.mutable.Map[Long, (Long, Long, Long, Double)]()
    hrs.foreach { h =>
      val (d, c) = byHr(h)
      val s = if (d == atRisk) 0.0 else surv * (1.0 - d.toDouble / atRisk)
      if (d > 0) dense(h) = (atRisk, d, c, s)
      surv = s
      atRisk -= (d + c)
    }
    val rows = operators.Relational.q166.fn(spark, sfDir).collect()
    assert(rows.length == dense.size)
    rows.foreach { r =>
      val (n, d, c, s) = dense(r.getAs[Long]("hrs"))
      assert(r.getAs[Long]("n_risk") == n)
      assert(r.getAs[Long]("d_conv") == d && r.getAs[Long]("c_cens") == c)
      assert(math.abs(r.getAs[Double]("s_km") - s) < 1e-5,
        s"hr ${r.get(0)}: ${r.getAs[Double]("s_km")} vs $s")
    }
    // survival is a nonincreasing curve in [0, 1]
    val ss = rows.map(_.getAs[Double]("s_km"))
    assert(ss.zip(ss.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(ss.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("q167 A/B test matches a dense chi-square replay") {
    val users = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("tc"))
      .collect()
      .map { r =>
        val arm = r.getLong(0) % 1000003L * 2654435761L % 2L
        val conv = !r.isNullAt(2) && r.getLong(2) <= r.getLong(1) + 3600000000L
        (arm, conv)
      }
    val na = users.count(_._1 == 0L).toLong
    val nb = users.count(_._1 == 1L).toLong
    val ca = users.count(u => u._1 == 0L && u._2).toLong
    val cb = users.count(u => u._1 == 1L && u._2).toLong
    val row = operators.Relational.q167.fn(spark, sfDir).head()
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(row.getAs[Long]("conv_a") == ca && row.getAs[Long]("conv_b") == cb)
    assert(row.getAs[Double]("rate_a") == ca.toDouble / na)
    assert(row.getAs[Double]("rate_b") == cb.toDouble / nb)
    val n = (na + nb).toDouble
    val convT = (ca + cb).toDouble
    val expect =
      if (convT == 0 || convT == n) 0.0
      else n * math.pow(math.max(0.0,
        math.abs(ca.toDouble * (nb - cb) - cb.toDouble * (na - ca)) - n / 2), 2) /
        (convT * (n - convT) * na * nb)
    assert(math.abs(row.getAs[Double]("chi2") - expect) < 1e-5,
      s"chi2 ${row.getAs[Double]("chi2")} vs dense $expect")
    assert(row.getAs[Boolean]("significant") ==
      (row.getAs[Double]("chi2") > 3.841459))
    assert(row.getAs[Double]("chi2") >= 0.0)
  }

  test("q168 weekly quantile drift matches a dense rank-cut replay") {
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us div 604800000000").as("wk"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val byWk = vals.groupBy(_._1).map { case (w, g) =>
      val sorted = g.map(_._2).sorted
      val n = sorted.length.toLong
      def cut(rank: Long) = sorted((rank - 1).toInt)
      w -> (n, cut((n + 1) / 2), cut((19 * n + 19) / 20))
    }
    val rows = operators.Relational.q168.fn(spark, sfDir).collect()
    assert(rows.length == byWk.size)
    val wks = rows.map(_.getAs[Long]("wk"))
    assert(wks.sorted.toSeq == wks.toSeq)
    rows.foreach { r =>
      val (n, p50, p95) = byWk(r.getAs[Long]("wk"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("p50") == p50, s"wk ${r.get(0)} p50")
      assert(r.getAs[Double]("p95") == p95, s"wk ${r.get(0)} p95")
      assert(p50 <= p95)
    }
    // first week has no predecessor: null ratios, unflagged
    assert(rows.head.isNullAt(rows.head.fieldIndex("wow_p50")))
    assert(!rows.head.getAs[Boolean]("drifted"))
    rows.tail.foreach { r =>
      assert(r.getAs[Boolean]("drifted") ==
        (math.abs(r.getAs[Double]("wow_p50") - 1.0) > 0.25 ||
          math.abs(r.getAs[Double]("wow_p95") - 1.0) > 0.25))
    }
  }

  test("q169 incremental distinct: merge equals one-pass sketch, 5% of exact, one corpus scan") {
    val rows = operators.Incremental.q169.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lossless-merge: incremental result == a from-scratch recompute
    // forced through a real sketch merge (two-slice union). A merged
    // read's composite estimate is partition-independent; a day whose
    // rows stay in one partition keeps the HIP accumulator instead and
    // reads slightly differently above coupon-exact cardinality — see
    // q169's scaladoc and RowsOnlyChecks (r9 sf1 measurement).
    val evs = Tables.events(spark, sfDir)
    val onePass = operators.Incremental
      .dailyUserSketch(evs.filter(col("event_id") % 2 === 0))
      .unionByName(operators.Incremental
        .dailyUserSketch(evs.filter(col("event_id") % 2 =!= 0)))
      .groupBy("day").agg(expr("hll_union_agg(sk)").as("sk"))
      .select(col("day"), expr("hll_sketch_estimate(sk)").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == onePass, "merged sketches differ from the recomputed merge")
    // accuracy: within 5% of exact distinct per day
    val exact = Tables.events(spark, sfDir)
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    rows.foreach { case (day, est) =>
      val err = math.abs(est - exact(day)).toDouble / exact(day)
      assert(err <= 0.05, s"day $day: est $est vs exact ${exact(day)} ($err)")
    }
    // incremental plan: the raw events table is scanned once (the delta);
    // the snapshot side reads persisted sketch binaries
    val plan = operators.Incremental.q169.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.split("events.parquet").length - 1 == 1,
      s"expected exactly one events scan:\n$plan")
  }

  test("q170 path conversion matches a dense replay at sf0.01") {
    val d = "/root/testdata/sf0.01" // sf0.001 has too few daily triples
    val evs = Tables.events(spark, d)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val H = 86400000000L
    val paths = evs.values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3))
      s.indices.flatMap { i =>
        if (i + 2 < s.length) {
          val (a, b, c) = (s(i), s(i + 1), s(i + 2))
          val gapOk = b._2 <= a._2 + H && c._2 <= b._2 + H
          val noPurch = Seq(a, b, c).forall(_._4 != "purchase")
          if (gapOk && noPurch) {
            val conv = i + 3 < s.length &&
              s(i + 3)._4 == "purchase" && s(i + 3)._2 <= c._2 + H
            Some((s"${a._4}>${b._4}>${c._4}", conv))
          } else None
        } else None
      }
    }.toSeq
    val dense = paths.groupBy(_._1)
      .map { case (p, g) => p -> (g.size.toLong, g.count(_._2).toLong) }
      .filter(_._2._1 >= 10)
      .toSeq
      .map { case (p, (n, c)) =>
        val r6 = BigDecimal(c.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (p, n, c, r6)
      }
      .sortBy { case (p, _, _, r) => (-r, p) }.take(15)
    val rows = operators.Relational.q170.fn(spark, d).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n"),
        r.getAs[Long]("n_conv"), r.getAs[Double]("conv_rate")))
    assert(rows.toSeq == dense, s"\ngot   ${rows.toSeq}\ndense $dense")
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, r) =>
      assert(c <= n && r >= 0.0 && r <= 1.0)
    }
  }

  test("q171 RFM segments match a dense tertile replay; customers conserve") {
    val cust = Tables.orders(spark, sfDir)
      .withColumn("oday",
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .groupBy("o_custkey")
      .agg(max("oday").as("cday"), count(lit(1)).as("f"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxday = cust.map(_._2).max
    val rows3 = cust.map { case (k, cd, f, m) =>
      (k, maxday - cd, f, m / 100000L, m)
    }
    def tertiles(vs: Seq[Long]): (Long, Long) = {
      val sorted = vs.sorted
      val n = sorted.length.toLong
      (sorted(((n + 2) / 3 - 1).toInt), sorted(((2 * n + 2) / 3 - 1).toInt))
    }
    val (rc1, rc2) = tertiles(rows3.map(_._2))
    val (fc1, fc2) = tertiles(rows3.map(_._3))
    val (mc1, mc2) = tertiles(rows3.map(_._4))
    val dense = rows3.groupBy { case (_, r, f, mb, _) =>
      val rs = if (r <= rc1) 3 else if (r <= rc2) 2 else 1
      val fs = if (f <= fc1) 1 else if (f <= fc2) 2 else 3
      val ms = if (mb <= mc1) 1 else if (mb <= mc2) 2 else 3
      rs * 100 + fs * 10 + ms
    }.map { case (seg, g) => seg -> (g.size.toLong, g.map(_._5).sum) }
    val rows = operators.Relational.q171.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == cust.length.toLong)
    assert(rows.length == dense.size)
    rows.foreach { r =>
      val (n, tot) = dense(r.getAs[Int]("segment"))
      assert(r.getAs[Long]("n_customers") == n, s"seg ${r.get(0)}")
      assert(r.getAs[Long]("total_cents") == tot, s"seg ${r.get(0)} cents")
      assert(math.abs(r.getAs[Double]("avg_cents") - tot.toDouble / n) < 1e-3)
    }
    // segments are valid RFM codes
    rows.foreach { r =>
      val s0 = r.getAs[Int]("segment")
      assert(Seq(s0 / 100, s0 / 10 % 10, s0 % 10).forall(d => d >= 1 && d <= 3))
    }
  }

  test("q156 matches the sign formula densely and preserves distances") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val scale = math.sqrt(3.0 / 16)
    def denseProj(x: Array[Float]): Array[Double] =
      Array.tabulate(16) { j =>
        var acc = 0.0
        var i = 0
        while (i < 64) {
          acc += x(i).toDouble * sim.Similarity.jlSign(i, j)
          i += 1
        }
        BigDecimal(scale * acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    val rows = sim.Similarity.q156.fn(spark, sfDir).collect()
    assert(rows.length == vecs.length)
    val byId = vecs.toMap
    val proj = rows.map { r =>
      val id = r.getAs[Long]("vec_id")
      val got = (0 until 16).map(j => r.getAs[Double](s"p$j")).toArray
      val want = denseProj(byId(id))
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"vec $id: $g vs $w")
      }
      id -> got
    }.toMap
    // JL property: squared-distance ratios concentrate near 1
    val sample = vecs.take(30)
    val ratios = for {
      (ia, xa) <- sample; (ib, xb) <- sample if ia < ib
    } yield {
      val dx = xa.zip(xb).map { case (p, q) => (p - q).toDouble }.map(v => v * v).sum
      val dy = proj(ia).zip(proj(ib)).map { case (p, q) => (p - q) * (p - q) }.sum
      dy / dx
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.4, s"mean distance ratio $mean")
    // k=16 has heavy per-pair tails (ε ~ √(ln n / k)); the MEAN is the
    // JL guarantee, individual pairs just need to stay finite-sane
    assert(ratios.forall(r => r > 0.01 && r < 12.0),
      s"distance ratio outside sanity band: ${ratios.min} .. ${ratios.max}")
  }
}
