package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.ScaleJoins
import graft.streaming.Events

class ScaleJoinsSpec extends SparkSpec {

  test("saltedJoin equals the plain join on a skewed key and shuffles on (key, salt)") {
    import spark.implicits._
    // 90% of the big side lands on one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i)).toDF("k", "v")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    // disable broadcast so the salting actually drives the exchange — the
    // plan counterpart of the AQE skew-split test below: the shuffle key
    // must be (k, _salt), spreading the hot key over `salt` reducers
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = ScaleJoins.saltedJoin(big, small, "k", salt = 8).select("k", "v", "name")
      val rows = salted.collect()
      assert(rows.length == plain.count())
      assert(rows.toSet == plain.collect().toSet)
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(l =>
          l.contains("hashpartitioning") && l.contains("_salt")),
        s"salted join must exchange on (k, _salt):\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    ScaleJoins.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    ScaleJoins.writeBucketed(ord, "b_orders", "l_orderkey", 8)
    val joined = ScaleJoins.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // the runtime counterpart of manual salting: with aggressive skew
    // thresholds, AQE's OptimizeSkewedJoin splits the hot partition and
    // marks the SortMergeJoin skew=true in the adaptive plan
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of the left side lands on key 0
      val big = spark.range(0, 60000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = big.join(right, "k")
      // key 0: 54000 ids with id%10!=0 plus id=0 itself = 54001 rows;
      // other matching keys: 10,20,…,1990 = 199 rows.
      // collect() (not count()) so the INSPECTED queryExecution is the
      // one that ran — count() spawns its own execution and the adaptive
      // plan here would stay un-finalized.
      assert(joined.collect().length == 54001 + 199)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally confs.keys.foreach(spark.conf.unset)
  }

  test("stream-static enrichment joins a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val dim = Seq(("click", 1), ("view", 2)).toDF("event_type", "weight")
    val q = Events.enrichStream(stream, dim, "event_type").writeStream
      .format("memory").queryName("enriched").outputMode(OutputMode.Append).start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:01:00"), "error", 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched")
      .select("event_type", "weight").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
    assert(rows == Set(("click", 1), ("error", -1)))
  }
}
