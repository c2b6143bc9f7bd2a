package graft

import org.apache.spark.sql.functions._

/** q180: the histogram rank-sum AUC must equal the O(n²) pairwise
  * definition computed directly on collected rows — proving the bounded
  * decomposition exact, not just plausible.
  */
class RankMetricSpec extends SparkSpec {

  test("q180 histogram AUC equals the direct pairwise Mann-Whitney count") {
    // replay the scorer: class-0 centroid from raw rows, distance per
    // vector, 2-dp quantization — then the O(n²) pairwise AUC
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding"), col("label"))
      .collect()
      .map(r => (r.getSeq[Float](0).map(_.toDouble).toArray, r.getInt(1)))
    val c0raw = vecs.filter(_._2 == 0).map(_._1)
    val dim = c0raw.head.length
    val c0 = Array.tabulate(dim) { i =>
      BigDecimal(c0raw.map(_(i)).sum / c0raw.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cc = c0.map(x => x * x).sum
    val scored = vecs.map { case (v, l) =>
      var vv = 0.0; var vc = 0.0; var i = 0
      while (i < dim) { vv += v(i) * v(i); vc += v(i) * c0(i); i += 1 }
      val score = -BigDecimal(vv - 2.0 * vc + cc)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (score, l == 0)
    }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filter(!_._2).map(_._1)
    var wins2 = 0L
    for (p <- pos; n <- neg)
      wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expectAuc = wins2.toDouble / (2.0 * pos.length * neg.length)
    val r = ml.VectorAgg.q180.fn(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.head.getAs[Long]("n_neg") == neg.length.toLong)
    assert(math.abs(r.head.getAs[Double]("auc") - expectAuc) < 2e-6,
      s"auc ${r.head.getAs[Double]("auc")} vs pairwise $expectAuc")
    // the centroid scorer must actually rank class 0 above the rest —
    // otherwise the eval target is vacuous (measured: 0.99 at sf0.001,
    // 0.79 at sf0.01 — the larger corpus is noisier but far from 0.5)
    assert(expectAuc > 0.75, s"expected a discriminative score, auc $expectAuc")
  }

  test("q181 bucketed Gini and top-decile share replay from raw customer totals") {
    val cust = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      .collect().map(_.getAs[Long]("cents"))
    val hist = cust.groupBy(_ / 100000L).toSeq
      .map { case (b, xs) => (b, xs.length.toLong, xs.sum) }
      .sortBy(_._1)
    val totN = hist.map(_._2).sum
    val totS = hist.map(_._3).sum
    var cumN = 0L
    var cumS = 0L
    var gini = 1.0
    var topShare = 0L
    val cut = totN - (totN + 9) / 10
    hist.foreach { case (_, n, sC) =>
      gini -= (n.toDouble / totN) * (2.0 * cumS / totS + sC.toDouble / totS)
      if (cumN + n > cut) topShare += sC
      cumN += n
      cumS += sC
    }
    val r = operators.Relational.q181.fn(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_customers") == totN)
    assert(r.head.getAs[Long]("total_cents") == totS)
    assert(math.abs(r.head.getAs[Double]("gini") - gini) < 1e-6, "gini")
    assert(math.abs(r.head.getAs[Double]("top_decile_share_ub")
      - topShare.toDouble / totS) < 1e-6, "top decile share")
    // structural bounds: 0 <= gini < 1, and the top decile can't hold
    // less than a tenth of the spend
    assert(gini >= 0.0 && gini < 1.0)
    assert(topShare.toDouble / totS >= 0.1 - 1e-9)
  }

  test("q184 KS replay: cross-multiplied max equals the direct cdf-gap scan; A/A must not fire") {
    val vals = Tables.orders(spark, sfDir)
      .select(
        expr("(unix_micros(cast(o_orderdate as timestamp)) div 86400000000) % 2")
          .as("sl"),
        expr("cast(round(o_totalprice * 100) as bigint) div 100000").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val buckets = vals.map(_._2).distinct.sorted
    val n0 = vals.count(_._1 == 0L).toLong
    val n1 = vals.count(_._1 == 1L).toLong
    var cum0 = 0L
    var cum1 = 0L
    var best = -1L
    var bestB = Long.MaxValue
    buckets.foreach { b =>
      cum0 += vals.count(v => v._1 == 0L && v._2 == b)
      cum1 += vals.count(v => v._1 == 1L && v._2 == b)
      val dn = math.abs(cum0 * n1 - cum1 * n0)
      if (dn > best) { best = dn; bestB = b }
    }
    val r = operators.Relational.q184.fn(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n0") == n0 && r.head.getAs[Long]("n1") == n1)
    assert(r.head.getAs[Long]("at_bucket") == bestB, "argmax bucket")
    val ksD = best.toDouble / (n0.toDouble * n1)
    assert(math.abs(r.head.getAs[Double]("ks_d") - ksD) < 1e-6)
    // even/odd day slices draw from the SAME distribution: the flag
    // firing here would be a false positive (q167's A/A lesson)
    assert(!r.head.getAs[Boolean]("drift_flag"),
      s"A/A slices flagged drift: D=$ksD crit=${r.head.getAs[Double]("ks_crit_05")}")
    assert(ksD > 0.0, "identical cdfs would make the test vacuous")
  }

  test("q185 weighted percentile replay: rank rule over cumulative weights") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100) as bigint) div 100000").as("b"),
        expr("cast(l_quantity as bigint)").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = operators.Relational.q185.fn(spark, sfDir).collect()
    val byFlag = li.groupBy(_._1)
    assert(rows.length == byFlag.size)
    rows.foreach { r =>
      val f = r.getAs[String]("flag")
      val hist = byFlag(f).groupBy(_._2).map { case (b, xs) => b -> xs.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val tot = hist.map(_._2).sum
      def cut(num: Long, den: Long): Long = {
        val target = (num * tot + den - 1) / den
        var cum = 0L
        hist.find { case (_, wb) => cum += wb; cum >= target }.get._1 * 100000L
      }
      assert(r.getAs[Long]("total_weight") == tot, s"$f weight")
      assert(r.getAs[Long]("p50_bucket_cents") == cut(1, 2), s"$f p50")
      assert(r.getAs[Long]("p90_bucket_cents") == cut(9, 10), s"$f p90")
      assert(r.getAs[Long]("p50_bucket_cents") <= r.getAs[Long]("p90_bucket_cents"))
    }
  }

  test("q186 Benford replay: digit counts, expectancies, per-digit chi2 contributions") {
    val digits = Tables.orders(spark, sfDir)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("c"))
      .collect().map(_.getLong(0).toString.head.asDigit.toLong)
    val n = digits.length.toLong
    val counts = digits.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val rows = operators.Relational.q186.fn(spark, sfDir).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1 && d <= 9)
      assert(r.getAs[Long]("n") == counts(d), s"digit $d count")
      val p = math.log(1.0 + 1.0 / d) / math.log(10.0)
      assert(math.abs(r.getAs[Double]("benford_p") - p) < 1e-6)
      val dev = counts(d).toDouble - n * p
      assert(math.abs(r.getAs[Double]("chi2_contrib") - dev * dev / (n * p)) < 1e-4,
        s"digit $d contrib")
    }
    // counts conserve; uniform-ish synthetic prices must DEVIATE from
    // Benford (the audit's honest finding on this corpus)
    assert(counts.values.sum == n)
    val chi2 = rows.map(_.getAs[Double]("chi2_contrib")).sum
    assert(chi2 > 20.0, s"expected a clear Benford deviation, chi2 $chi2")
  }
}
