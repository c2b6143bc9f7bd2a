package graft

import org.apache.spark.sql.functions._

/** Dense replays for the basket/profile/affinity trio (q172/q173/q174):
  * each operator's output is recomputed from raw collected rows in plain
  * Scala at sf0.001 and compared value-for-value, plus the structural
  * invariants a user of each table relies on.
  */
class AffinityProfileSpec extends SparkSpec {

  private lazy val liPart: Array[(Long, String)] =
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .join(Tables.part(spark, sfDir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1)))

  test("q172 replay: support/confidence/lift from raw basket counts") {
    val baskets = liPart.groupBy(_._1).map { case (_, rs) =>
      rs.map(_._2).toSet
    }.toSeq
    val nOrders = baskets.size
    val single = baskets.flatten.groupBy(identity).map { case (b, xs) => b -> xs.size }
    val pairCnt = baskets
      .flatMap(bs => bs.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.size }
    val rows = operators.Relational.q172.fn(spark, sfDir).collect()
    assert(rows.length == 20, s"expected top-20, got ${rows.length}")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))
      val nAb = pairCnt((a, b))
      assert(r.getAs[Long]("n_ab") == nAb, s"($a,$b) n_ab")
      val lift = nAb.toDouble * nOrders / (single(a).toLong * single(b))
      assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-6, s"($a,$b) lift")
      assert(math.abs(r.getAs[Double]("support") - nAb.toDouble / nOrders) < 1e-6)
      assert(math.abs(r.getAs[Double]("conf_a_b") - nAb.toDouble / single(a)) < 1e-6)
      assert(math.abs(r.getAs[Double]("conf_b_a") - nAb.toDouble / single(b)) < 1e-6)
      // confidence can never undercut support (cnt_a <= n_orders)
      assert(r.getAs[Double]("conf_a_b") >= r.getAs[Double]("support") - 1e-9)
    }
    // descending by rounded lift with (a, b) tiebreak
    val keys = rows.map(r => (-r.getAs[Double]("lift"),
      r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))).toSeq
    assert(keys == keys.sorted, "top-20 not in (lift desc, pair) order")
  }

  test("q173 replay: per-column null/distinct/min/max from raw rows") {
    val o = Tables.orders(spark, sfDir)
      .withColumn("o_odate_us",
        expr("unix_micros(cast(o_orderdate as timestamp))"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_odate_us",
        "o_orderstatus", "o_orderpriority")
      .collect()
    val rows = operators.Relational.q173.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 6)
    def vals(i: Int): Seq[Any] = o.map(_.get(i)).toSeq
    val numIdx = Map("o_orderkey" -> 0, "o_custkey" -> 1,
      "o_totalprice" -> 2, "o_odate_us" -> 3)
    val strIdx = Map("o_orderstatus" -> 4, "o_orderpriority" -> 5)
    (numIdx ++ strIdx).foreach { case (name, i) =>
      val r = rows(name)
      val vs = vals(i).filter(_ != null)
      assert(r.getAs[Long]("n_rows") == o.length, s"$name n_rows")
      assert(r.getAs[Long]("n_nulls") == o.length - vs.size, s"$name n_nulls")
      assert(r.getAs[Long]("n_distinct") == vs.distinct.size, s"$name n_distinct")
      if (numIdx.contains(name)) {
        val ds = vs.map {
          case l: java.lang.Long => l.toDouble
          case d: java.lang.Double => d.doubleValue
        }
        assert(r.getAs[Double]("min_num") == ds.min, s"$name min")
        assert(r.getAs[Double]("max_num") == ds.max, s"$name max")
        assert(r.getAs[String]("min_str") == null && r.getAs[String]("max_str") == null)
      } else {
        val ss = vs.map(_.asInstanceOf[String])
        assert(r.getAs[String]("min_str") == ss.min, s"$name min_str")
        assert(r.getAs[String]("max_str") == ss.max, s"$name max_str")
        assert(r.isNullAt(r.fieldIndex("min_num")) && r.isNullAt(r.fieldIndex("max_num")))
      }
    }
  }

  test("q174 replay: cosine from raw customer-brand purchase vectors") {
    val custBrand = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .join(Tables.part(spark, sfDir).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val ss = custBrand.groupBy(_._1._2)
      .map { case (b, m) => b -> m.values.map(c => c * c).sum }
    val dots = custBrand.groupBy(_._1._1).toSeq.flatMap { case (_, m) =>
      val v = m.map { case ((_, b), c) => b -> c }.toSeq.sortBy(_._1)
      for (i <- v.indices; j <- i + 1 until v.size)
        yield ((v(i)._1, v(j)._1), v(i)._2 * v(j)._2)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val rows = operators.Relational.q174.fn(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))
      assert(r.getAs[Long]("dot") == dots((a, b)), s"($a,$b) dot")
      val cos = dots((a, b)).toDouble / (math.sqrt(ss(a).toDouble) * math.sqrt(ss(b).toDouble))
      assert(math.abs(r.getAs[Double]("cosine") - cos) < 1e-6, s"($a,$b) cosine")
      assert(r.getAs[Double]("cosine") > 0 && r.getAs[Double]("cosine") <= 1.0)
    }
    val keys = rows.map(r => (-r.getAs[Double]("cosine"),
      r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))).toSeq
    assert(keys == keys.sorted, "top-20 not in (cosine desc, pair) order")
  }
}
