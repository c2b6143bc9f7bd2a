package graft

import org.apache.spark.sql.functions._

/** Dense driver replays + structural invariants for the round-10 operator
  * batch (q204 prefix-filter set-similarity join, q205 ACF, q206 TWAP,
  * q207 equi-depth histogram, q208 RRF fusion). Each operator is
  * recomputed from raw collected rows in plain Scala and compared
  * value-for-value — the same discipline as the r8 analytics batch.
  */
class R10OperatorsSpec extends SparkSpec {

  // ── q204: the prefix-filter lemma is a GUARANTEE, not a recall target ──

  private def gramSet(t: String): Set[String] =
    if (t.length < 20) Set.empty
    else (0 to t.length - 20).map(i => t.substring(i, i + 20)).toSet

  test("q204 prefix-filter join equals the brute-force O(n²) Jaccard join") {
    val tau = 0.5
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> gramSet(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if BigDecimal(j).setScale(8, BigDecimal.RoundingMode.HALF_EVEN) >= tau
    } yield (a, b, inter.toLong)).toSet
    val got = dedup.Dedup.prefixFilterJoin(spark, sfDir, tau, takeN = 1 << 20)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"))).toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("q204 reported intersections equal the recomputed gram-set overlaps") {
    // every surviving pair must share at least one token — and with
    // exact verification the reported inter must equal |A∩B| recomputed
    val rows = dedup.Dedup.q204.fn(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> gramSet(r.getString(1)))
      .toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert((docs(a) & docs(b)).size.toLong == r.getAs[Long]("inter"))
      assert(r.getAs[Long]("n_a") == docs(a).size.toLong)
      assert(r.getAs[Long]("n_b") == docs(b).size.toLong)
    }
  }

  // ── q205: dense ACF replay + the null-corpus honesty bar ──

  test("q205 ACF replays densely; the null corpus stays inside the noise band") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(expr("ts_us div 3600000000").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = operators.Relational.q205.fn(spark, sfDir).collect()
    assert(rows.length == 36)
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag")
      val pairs = hourly.toSeq.flatMap { case (h, n) =>
        hourly.get(h + lag).map(n2 => (n, n2)) }
      val np = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val expect = (np.toDouble * sxy - sx.toDouble * sy) /
        (math.sqrt(np.toDouble * sxx - sx.toDouble * sx) *
         math.sqrt(np.toDouble * syy - sy.toDouble * sy))
      assert(r.getAs[Long]("np") == np, s"lag $lag pair count")
      assert(math.abs(r.getAs[Double]("r") - expect) < 1e-8, s"lag $lag r")
    }
    // honesty: the generator's arrivals are uniform — a correct ACF must
    // NOT report a strong period (q167's A/A convention). 0.25 is ~2.5×
    // the 2/√n white-noise band at the smallest SF.
    assert(rows.forall(r => math.abs(r.getAs[Double]("r")) < 0.25),
      "ACF hallucinated structure on an aperiodic corpus")
    assert(rows.count(_.getAs[Boolean]("is_top")) == 1, "exactly one top lag")
    val top = rows.filter(_.getAs[Boolean]("is_top")).head
    val best = rows.filter(_.getAs[Long]("lag") >= 2)
      .maxBy(r => (r.getAs[Double]("r"), -r.getAs[Long]("lag")))
    assert(top.getAs[Long]("lag") == best.getAs[Long]("lag"))
  }

  // ── q206: dense TWAP replay ──

  test("q206 time-weighted averages replay densely from raw events") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        expr("cast(round(value * 100) as bigint)").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val segs = sorted.zip(sorted.tail).map { case (a, b) =>
        (BigInt(a._4) * BigInt(b._3 - a._3), b._3 - a._3) }
      if (segs.isEmpty) None
      else {
        val svd = segs.map(_._1).sum
        val sd = segs.map(_._2).sum
        Some(svd.toDouble / sd.toDouble / 100)
      }
    }.toMap.collect { case (u, Some(t)) => u -> t }
    val expect = byUser.values.groupBy(t => math.floor(t).toLong)
      .map { case (b, ts) => b -> (ts.size.toLong, ts.sum / ts.size) }
    val rows = streaming.Events.q206.fn(spark, sfDir).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val (users, avg) = expect(b)
      assert(r.getAs[Long]("users") == users, s"bucket $b users")
      // avg is a multi-term double mean (rounded to 6 in the operator;
      // the replay sums in a different order) — compare at that grain
      assert(math.abs(r.getAs[Double]("avg_twap") - avg) < 2e-6, s"bucket $b avg")
    }
  }

  // ── q207: conservation + depth invariants ──

  test("q207 equi-depth bins conserve rows and cents, tile the range, and balance") {
    val rows = operators.Relational.q207.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L until 16L))
    val li = Tables.lineitem(spark, sfDir)
      .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
      .agg(count(lit(1)).as("n"), sum("c").as("s")).collect()(0)
    assert(rows.map(_.getAs[Long]("rows_in_bin")).sum == li.getLong(0))
    assert(rows.map(_.getAs[Long]("sum_cents")).sum == li.getLong(1))
    // bins tile the value axis in order without overlap
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents")) }
    // equi-depth at bucket granularity: depths within 2× of each other
    val depths = rows.map(_.getAs[Long]("rows_in_bin"))
    assert(depths.max.toDouble / depths.min <= 2.0,
      s"bin depths too skewed: min=${depths.min} max=${depths.max}")
  }

  // ── q208: dense RRF replay ──

  test("q208 RRF fusion replays densely from the two funnels") {
    val lex = text.TextAnalysis.q69.fn(spark, sfDir)
      .orderBy(desc("bm25"), asc("doc_id")).limit(100).collect()
      .map(r => r.getAs[Long]("doc_id")).zipWithIndex
      .map { case (d, i) => d -> (i + 1) }.toMap
    val semRanks = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.VectorExprs.cosineSim(col("embedding"),
          expr("transform(sequence(1, 64), i -> (CAST((i * 37) % 19 AS DOUBLE) - 9) / 10)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, c) => (-c, id) }.take(100).map(_._1).zipWithIndex
      .map { case (d, i) => d -> (i + 1) }.toMap
    val fused = (lex.keySet ++ semRanks.keySet).toSeq.map { d =>
      val s = lex.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        semRanks.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (d, BigDecimal(s).setScale(8, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    }.sortBy { case (d, s) => (-s, d) }.take(20)
    val rows = sim.Similarity.q208.fn(spark, sfDir).collect()
    assert(rows.length == fused.length)
    rows.zip(fused).foreach { case (r, (d, s)) =>
      assert(r.getAs[Long]("doc_id") == d)
      assert(math.abs(r.getAs[Double]("rrf") - s) < 1e-9)
    }
    // fusion must be able to surface a doc the lexical funnel missed —
    // the property that distinguishes RRF from q98's cascade
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("r_lex"))),
      "no semantic-only doc in the fused top-20 (cascade-equivalent)")
  }

  // ── q209: dense Spearman/Pearson replay with exact BigInt sums ──

  test("q209 rank and linear correlations replay densely from raw rows") {
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        expr("cast(round(l_quantity) as bigint)").as("qv"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = operators.Relational.q209.fn(spark, sfDir).collect()
    val byFlag = raw.groupBy(_._1)
    assert(rows.length == byFlag.size)
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val g = byFlag(flag)
      val n = g.length
      assert(r.getAs[Long]("n") == n.toLong)
      // twice-mid-ranks per variable (bucket granularity for price)
      def ranks2(vals: Seq[Long]): Map[Long, BigInt] = {
        val cnt = vals.groupBy(identity).view.mapValues(_.size).toMap
        val sorted = cnt.keys.toSeq.sorted
        var cum = 0L
        sorted.map { v =>
          val c = cnt(v); val r2 = BigInt(2) * cum + c + 1; cum += c
          v -> r2
        }.toMap
      }
      val rx = ranks2(g.map(_._2).toSeq)
      val ry = ranks2(g.map(_._3 / 1000).toSeq)
      def pearson(xs: Seq[BigInt], ys: Seq[BigInt]): Double = {
        val nn = BigInt(n)
        val sx = xs.sum; val sy = ys.sum
        val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        (nn.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
          (math.sqrt(nn.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
           math.sqrt(nn.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      }
      val spearman = pearson(g.map(t => rx(t._2)).toSeq,
        g.map(t => ry(t._3 / 1000)).toSeq)
      val linear = pearson(g.map(t => BigInt(t._2)).toSeq,
        g.map(t => BigInt(t._3)).toSeq)
      assert(math.abs(r.getAs[Double]("spearman") - spearman) < 1e-7,
        s"flag $flag spearman")
      assert(math.abs(r.getAs[Double]("pearson") - linear) < 1e-7,
        s"flag $flag pearson")
      // quantity and price are independent in the generator: both
      // coefficients must sit near zero (the q167 A/A convention), and
      // Spearman on ranks must broadly agree with Pearson on values here
      assert(math.abs(spearman) < 0.15 && math.abs(linear) < 0.15,
        s"flag $flag correlation hallucinated on independent columns")
    }
  }

  // ── q210: mutual pairs derive exactly from the verified kNN edges ──

  test("q210 mutual-kNN pairs equal the reciprocal subset of the q52 graph") {
    val edges = sim.Similarity.q52.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("rn"), r.getAs[Double]("cos_sim")))
    val byPair = edges.map(e => (e._1, e._2) -> e).toMap
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = edges.filter { case (a, b, _, _) =>
      a < b && byPair.contains((b, a))
    }.map { case (a, b, rnAb, cos) =>
      val (_, _, rnBa, cosRev) = byPair((b, a))
      assert(cos == cosRev, s"asymmetric cos on mutual pair ($a,$b)")
      (a, b, rnAb, rnBa, cos, labels(a) == labels(b))
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = sim.Similarity.q210.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("rn_ab"), r.getAs[Int]("rn_ba"),
        r.getAs[Double]("cos_sim"), r.getAs[Boolean]("same_label"))).toSeq
    assert(got == expect,
      s"mutual sets differ: got ${got.size}, expect ${expect.size}")
    assert(expect.nonEmpty, "no mutual pairs at this SF — vacuous test")
    // the generator's labels are independent of embedding geometry, so
    // the agreement rate lands near the 1/|labels| chance floor — the
    // audit's value is precisely that it MEASURES this honestly (a real
    // corpus with label-aligned embeddings reads high); no structure bar.
  }
}
