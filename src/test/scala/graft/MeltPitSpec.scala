package graft

import org.apache.spark.sql.functions._

/** Dense replays for q175 (unpivot round-trip) and q176 (SCD2
  * point-in-time join): both recomputed from raw collected rows in plain
  * Scala at sf0.001.
  */
class MeltPitSpec extends SparkSpec {

  test("q175 unpivot(pivot(events)) equals the direct long-form counts") {
    val raw = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expect = raw.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rows = operators.Relational.q175.fn(spark, sfDir).collect()
    assert(rows.length == expect.size, "row count != distinct (day, type) combos")
    rows.foreach { r =>
      val k = (r.getAs[String]("day"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("cnt") == expect(k), s"$k count")
    }
    val keys = rows.map(r => (r.getAs[String]("day"), r.getAs[String]("event_type"))).toSeq
    assert(keys == keys.sorted, "not in (day, event_type) order")
  }

  test("q176 every shipment lands in exactly one version; replay matches") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("od_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ships = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr("unix_micros(cast(l_shipdate as timestamp))").as("ship_us"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("val_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per-customer version intervals (first version floored at epoch 0),
    // ordered by (date, orderkey): (okey, vfromReal, vfromEff, vto)
    val versions = orders.groupBy(_._1).map { case (c, os) =>
      val sorted = os.sortBy(o => (o._3, o._2))
      val iv = sorted.zipWithIndex.map { case ((_, okey, from), i) =>
        val to = if (i + 1 < sorted.length) sorted(i + 1)._3 else Long.MaxValue
        (okey, from, if (i == 0) 0L else from, to)
      }
      c -> iv
    }
    val orderCust = orders.map(o => o._2 -> o._1).toMap
    // replay: each shipment joins the containing interval of its customer
    var agg = Map.empty[(Boolean, Boolean, Boolean), (Long, Long)]
    ships.foreach { case (okey, shipUs, cents) =>
      val c = orderCust(okey)
      val hits = versions(c).filter(v => shipUs >= v._3 && shipUs < v._4)
      assert(hits.length == 1, s"shipment of order $okey matched ${hits.length} versions")
      val v = hits.head
      val key = (okey == v._1, v._4 == Long.MaxValue, shipUs < v._2)
      val (n, sc) = agg.getOrElse(key, (0L, 0L))
      agg += key -> (n + 1, sc + cents)
    }
    val rows = operators.Relational.q176.fn(spark, sfDir).collect()
    assert(rows.length == agg.size)
    rows.foreach { r =>
      val key = (r.getAs[Boolean]("same_version"), r.getAs[Boolean]("is_current"),
        r.getAs[Boolean]("backfill"))
      val (n, sc) = agg(key)
      assert(r.getAs[Long]("n_ship") == n, s"$key n_ship")
      assert(r.getAs[Long]("value_cents") == sc, s"$key value_cents")
    }
    // the classes the operator exists to separate must both occur:
    // cross-version shipments (a latest-state join computes these wrong)
    // and pre-history backfill rows
    assert(agg.keys.exists(!_._1), "expected some shipment to cross versions")
    assert(agg.keys.exists(_._3), "expected some pre-history backfill shipment")
    // conservation: every lineitem row lands somewhere
    assert(agg.values.map(_._1).sum == ships.length)
  }

  test("q177 proration replays exactly and every order reconciles to the cent") {
    val totals = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lines = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("w"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    var flagAgg = Map.empty[(String, String), (Long, Long)]
    lines.groupBy(_._1).foreach { case (okey, ls) =>
      val total = totals(okey)
      val sw = ls.map(_._5).sum
      val withBase = ls.map { l =>
        (l, total * l._5 / sw, total * l._5 % sw)
      }
      val leftover = total - withBase.map(_._2).sum
      assert(leftover >= 0 && leftover < ls.length, s"order $okey leftover $leftover")
      val ranked = withBase.sortBy { case (l, _, rem) => (-rem, l._2) }.zipWithIndex
      var sumAlloc = 0L
      ranked.foreach { case ((l, base, _), i) =>
        val alloc = base + (if (i < leftover) 1L else 0L)
        sumAlloc += alloc
        val key = (l._3, l._4)
        val (a, n) = flagAgg.getOrElse(key, (0L, 0L))
        flagAgg += key -> (a + alloc, n + 1)
      }
      // the operator's whole point: allocations reconcile EXACTLY
      assert(sumAlloc == total, s"order $okey allocated $sumAlloc != total $total")
    }
    val rows = operators.Relational.q177.fn(spark, sfDir).collect()
    assert(rows.length == flagAgg.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))
      val (a, n) = flagAgg(key)
      assert(r.getAs[Long]("alloc_cents") == a, s"$key alloc")
      assert(r.getAs[Long]("n_lines") == n, s"$key n")
    }
  }
}
