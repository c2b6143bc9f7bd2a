package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured skew-join demonstration: the empirical companion to
  * [[ScaleJoins]] (VERDICT-r8 #6 — "salting/AQE are spec'd on toy data;
  * build a deliberately Zipf-skewed join key and assert the measured
  * post-split partition-size histogram").
  *
  * The skewed corpus is the real `events` table re-keyed by an EXACT
  * closed-form power law: with u uniform on [0,1),
  * `zkey = min(floor(1/(1-u)), K)` has P(zkey=k) = 1/(k(k+1)) — the
  * textbook inverse-CDF construction (P(1)=1/2, P(2)=1/6, P(3)=1/12 …,
  * a Zipf-tail with ~50% of ALL rows on one key). u comes from
  * xxhash64(event_id), so the corpus is deterministic at every SF and
  * the hot-key share is provable, not sampled. This is the adversarial
  * case for a shuffle join: hashpartitioning(zkey) must put half the
  * table in one reducer no matter how many partitions you provision.
  *
  * Three strategies over the identical join (events×K-row dim):
  *   - `plain`: AQE skew-split OFF — measures the disease. The hot
  *     partition's row share ≈ the hot key's mass (~50%).
  *   - `aqe`: AQE `OptimizeSkewedJoin` ON with an advisory size —
  *     the runtime remedy. The hot partition splits into
  *     ~hotBytes/advisory slices, each joined against a replicated read
  *     of the dim side's matching partition.
  *   - `salted`: [[ScaleJoins.saltedJoin]] — the manual remedy for when
  *     AQE can't see the skew (e.g. it's introduced by an exploding
  *     expression after the exchange). Hot share drops to ~1/(2·salt).
  *
  * Partition "size" is measured in ROWS of final join output per task
  * partition via `spark_partition_id()` grouped AFTER the join — the
  * post-split layout AQE actually executed, not the static plan's
  * intent. Each strategy also returns a content checksum so the spec
  * can assert all three computed the SAME join.
  *
  * The diagnosis step is q108's skew report pointed at this same corpus
  * ([[diagnose]]) — the engineer-facing loop: run q108-on-your-key,
  * read skew_factor and heavy-hitter mass, then pick aqe/salted.
  */
object SkewLab {

  /** Bounded key domain: the cap absorbs only P(1/(1-u) ≥ K) = 1/K of
    * the mass, so the distribution below the cap is exactly Zipf-like.
    */
  val MaxKey = 1000

  /** The deterministic Zipf-keyed big side (one row per event).
    *
    * The hash repartition matters for the DEMO's fidelity, not the data:
    * AQE splits a skewed reduce partition along its map-side block
    * boundaries, so a big side read as one small file = one map block =
    * nothing to split — an artifact of toy scale a 1000-mapper cluster
    * never has. 16 uniform map tasks restore the real-world shape at
    * every SF.
    */
  def zipfKeyed(spark: SparkSession, sfDir: String): DataFrame = {
    val u = pmod(xxhash64(col("event_id")), lit(1000000L)).cast("double") / 1000000.0
    graft.Tables.events(spark, sfDir).select(
      col("event_id"),
      least(floor(lit(1.0) / (lit(1.0) - u)), lit(MaxKey.toLong)).cast("long").as("zkey"),
      col("value"))
      .repartition(16, col("event_id"))
  }

  /** K-row dimension: small enough to broadcast — which is exactly why
    * the demo DISABLES broadcast: at 100 TB the skewed dim is the one
    * that outgrew the broadcast threshold, or the build side of a
    * shuffle join you can't avoid.
    */
  def dim(spark: SparkSession): DataFrame =
    spark.range(1, MaxKey + 1).select(
      col("id").as("zkey"), (col("id") % 7).cast("long").as("zclass"))

  /** q108's report shape over the zipf corpus: one O(keys) count
    * shuffle, then percentiles/heavy-hitters on the bounded count
    * table. skew_factor here is provably ~n/2 / p50 — the number that
    * tells you a plain shuffle join is doomed before you run it.
    */
  def diagnose(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = zipfKeyed(spark, sfDir).groupBy("zkey").agg(count(lit(1)).as("cnt"))
    val stats = c.agg(
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)").cast("bigint").as("p50_cnt"),
      sum(col("cnt")).as("n_rows"))
    c.orderBy(desc("cnt"), asc("zkey")).limit(3)
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("cnt"), asc("zkey"))).cast("int"))
      .crossJoin(broadcast(stats))
      .select(col("rk"), col("zkey").as("heavy_key"), col("cnt").as("heavy_cnt"),
        round(col("heavy_cnt").cast("double") / col("n_rows"), 4).as("heavy_share"),
        col("n_keys"), col("max_cnt"), col("p50_cnt"),
        round(col("max_cnt").cast("double") / col("p50_cnt"), 4).as("skew_factor"))
      .orderBy("rk")
  }

  /** One measured strategy run. `top` is the per-partition row histogram
    * (descending, all non-empty partitions); `maxShare` = top.head /
    * rows; `checksum` fingerprints the join CONTENT (strategy-invariant);
    * `planSkewSplit` reports whether the executed plan carries AQE's
    * skew=true marker.
    */
  final case class SkewRun(strategy: String, rows: Long, partitions: Int,
      maxShare: Double, top: Seq[Long], checksum: Long, planSkewSplit: Boolean,
      wallSec: Double)

  /** Execute the demo join under `strategy` and measure the final
    * partition layout. `advisoryBytes` sizes AQE's split target (callers
    * scale it to the SF under test — the point is splits HAPPEN, the
    * absolute target is deployment-tuned).
    */
  def run(spark: SparkSession, sfDir: String, strategy: String,
      salt: Int = 8, advisoryBytes: String = "64KB"): SkewRun = {
    val confs: Map[String, String] = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" ->
        (if (strategy == "aqe") "true" else "false")) ++
      (if (strategy == "aqe") Map(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> advisoryBytes,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisoryBytes)
      else Map.empty)
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = zipfKeyed(spark, sfDir)
      val d = dim(spark)
      val joined = strategy match {
        case "salted" => ScaleJoins.saltedJoin(big, d, "zkey", salt)
        case _        => big.join(d, "zkey")
      }
      val t0 = System.nanoTime()
      // count rows per FINAL join task via the RDD face of the join
      // itself: the join must be the result stage — AQE's
      // OptimizeSkewedJoin declines to split when another operator rides
      // the same stage (it canonicalizes against extra-shuffle risk), so
      // a groupBy(spark_partition_id()) probe would measure a plan the
      // remedy was never applied to
      // queryExecution.toRdd, NOT .rdd: .rdd builds a second
      // QueryExecution for row deserialization, so the plan inspected
      // below would be one that never ran
      val counts = joined.queryExecution.toRdd
        .mapPartitionsWithIndex((_, it) => Iterator(it.size.toLong))
        .collect().filter(_ > 0).sorted(Ordering[Long].reverse).toSeq
      val wall = (System.nanoTime() - t0) / 1e9
      val plan = joined.queryExecution.executedPlan.toString
      // content fingerprint: order- and partition-layout-invariant
      val chk = joined.agg(
        count(lit(1)).as("n"),
        sum(col("zkey") * col("zclass") + col("event_id")).as("s"))
        .collect()(0)
      SkewRun(strategy, chk.getLong(0), counts.size,
        counts.head.toDouble / counts.sum, counts.take(12),
        chk.getLong(0) ^ chk.getLong(1), plan.contains("skew=true"), wall)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
