package graft

import org.apache.spark.sql.functions._

/** Dense replays for q182 (ordered list aggregation) and q183 (cohort
  * LTV triangle), recomputed from raw collected rows at sf0.001.
  */
class LtvSpec extends SparkSpec {

  private lazy val orders: Array[(Long, Long, Long, String, String, Long)] =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("od_us"),
        col("o_orderstatus"), col("o_orderpriority"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getLong(5)))

  test("q182 replay: status sequence ordered by (date, key), sorted distinct priorities") {
    val rows = operators.Relational.q182.fn(spark, sfDir).collect()
    val byCust = orders.groupBy(_._1)
    assert(rows.length == byCust.size)
    rows.foreach { r =>
      val c = r.getAs[Long]("o_custkey")
      val os = byCust(c)
      val seq = os.sortBy(o => (o._3, o._2)).map(_._4).mkString(",")
      val pri = os.map(_._5).distinct.sorted.mkString("|")
      assert(r.getAs[String]("status_seq") == seq, s"cust $c seq")
      assert(r.getAs[String]("priorities") == pri, s"cust $c priorities")
      assert(r.getAs[Long]("n_orders") == os.length.toLong, s"cust $c n")
    }
  }

  test("q183 replay: cohort ages and cumulative cents; triangle invariants") {
    val cents = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cohortOf = orders.groupBy(_._1).map { case (c, os) => c -> os.map(_._6).min }
    val cells = orders.groupBy(o => (cohortOf(o._1), o._6 - cohortOf(o._1)))
      .map { case (k, os) => k -> (os.length.toLong, os.map(o => cents(o._2)).sum) }
    val rows = operators.Relational.q183.fn(spark, sfDir).collect()
    assert(rows.length == cells.size)
    var running = Map.empty[Long, Long]
    rows.foreach { r =>
      val k = (r.getAs[Long]("cohort_m"), r.getAs[Long]("age_m"))
      val (n, s) = cells(k)
      assert(r.getAs[Long]("n_orders") == n, s"$k n_orders")
      assert(r.getAs[Long]("cents") == s, s"$k cents")
      assert(k._2 >= 0, "age cannot be negative (cohort = first purchase)")
      val cum = running.getOrElse(k._1, 0L) + s
      assert(r.getAs[Long]("cum_cents") == cum, s"$k cumulative")
      running += k._1 -> cum
    }
    // age-0 cell exists for every cohort (the first purchase itself)
    val cohorts = cells.keys.map(_._1).toSet
    assert(cohorts.forall(c => cells.contains((c, 0L))))
    // total conservation: sum of cells == sum of all order cents
    assert(cells.values.map(_._2).sum == cents.values.sum)
  }
}
