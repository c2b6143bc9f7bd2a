package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev probe for the q204/q217 factored prefix-filter plan: rebuilds the
  * gated path's intermediates (docs → groups → extended-prefix buckets)
  * with the SAME expressions as prefixFilterJoinFactored and prints their
  * cardinalities — in particular the triangle pair-stream size
  * Σ C(|ids|,2) over the collapsed distinct bucket arrays, the term that
  * decides whether the verify funnel fits on disk at a given SF. Pure
  * measurement: no query output, no persisted state beyond the session.
  *
  * NOTE (ADVICE r13): this probes the FLOOR-THRESHOLD regime (extended
  * prefix + AND gate). Since the r13 two-regime split, production runs
  * with takeN = 100 usually take the RAISED-threshold regime
  * (tauRun = max(tau, J₀ − 1e-7), classic prefix) instead — so these
  * cardinalities bound the fallback funnel, not necessarily the plan
  * that actually executes when the raise fires.
  *
  * Usage: SPARK_GRAFT_SF_DIR=gen/sf10 SPARK_GRAFT_CPUS=32 \
  *   tools/run_main.sh graft.ProbePf
  */
object ProbePf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tau = 0.5
    def p(k: String, v: Any): Unit = println(s"[probe-pf] $k = $v")

    val t0 = System.nanoTime()
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.VectorExprs.charNgrams(col("text"), 20))).as("token"))
    val dict = Dedup.shingleDict(spark, sfDir)
    p("vocab", dict.count())
    val singles = Dedup.shingleSingles(spark, sfDir)
    p("singles(df=1)", singles)
    val docs = tok.join(dict.select("token", "tid"), "token")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tid"))).as("toks"),
        count(lit(1)).as("n"))
      .withColumn("plen", (col("n") - ceil(lit(tau) * col("n")) + 1).cast("int"))
      .localCheckpoint(false)
    p("docs", docs.count())
    p("docs_build_s", (System.nanoTime() - t0) / 1e9)

    val t1 = System.nanoTime()
    val groups = docs
      .select(col("doc_id"), col("n"),
        expr(s"filter(toks, t -> t >= ${singles}L)").as("core"))
      .withColumn("clen", size(col("core")).cast("long"))
      .filter(col("clen") > 0)
      .groupBy("core", "clen")
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("members"),
        min(col("n")).as("n_min"))
      .withColumn("amin", ceil(lit(tau) * col("n_min")).cast("long"))
      .filter(col("clen") >= col("amin"))
      .withColumn("m", greatest(lit(0L),
        floor(col("amin") / 2) - lit(Dedup.PrefixGateExt.toLong)))
      .withColumn("plen", (col("clen") - col("m")).cast("int"))
      .withColumn("gid", monotonically_increasing_id())
      .localCheckpoint(false)
    val gStats = groups.agg(count(lit(1)).as("g"), sum("clen").as("sum_clen"),
      max("clen").as("max_clen"), sum("plen").as("sum_plen"),
      sum(size(col("members"))).as("sum_members")).head()
    p("groups", gStats.getLong(0))
    p("sum_clen", gStats.getLong(1))
    p("max_clen", gStats.getLong(2))
    p("sum_plen", gStats.getLong(3))
    p("sum_members", gStats.getLong(4))
    p("groups_build_s", (System.nanoTime() - t1) / 1e9)

    val t2 = System.nanoTime()
    val pre = groups.select(col("gid"), col("plen"),
        posexplode(col("core")).as(Seq("pos", "tid")))
      .filter(col("pos") < col("plen"))
      .select("gid", "tid")
    val rawBuckets = pre.groupBy("tid")
      .agg(sort_array(collect_set(col("gid"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .localCheckpoint(false)
    val rb = rawBuckets.agg(count(lit(1)).as("buckets"),
      sum(size(col("ids"))).as("sum_sz"), max(size(col("ids"))).as("max_sz"),
      sum(expr("cast(size(ids) as bigint) * (cast(size(ids) as bigint) - 1) div 2"))
        .as("raw_pairs")).head()
    p("buckets>1", rb.getLong(0))
    p("sum_bucket_sz", rb.getLong(1))
    p("max_bucket_sz", rb.getInt(2))
    p("raw_pair_stream_UNcollapsed", rb.getLong(3))
    val buckets = rawBuckets.groupBy("ids").agg(count(lit(1)).as("mult"))
      .localCheckpoint(false)
    val cb = buckets.agg(count(lit(1)).as("arrays"),
      sum(expr("cast(size(ids) as bigint) * (cast(size(ids) as bigint) - 1) div 2"))
        .as("pair_stream"), max(size(col("ids"))).as("max_sz"),
      sum("mult").as("sum_mult")).head()
    p("distinct_arrays", cb.getLong(0))
    p("pair_stream_collapsed", cb.getLong(1))
    p("max_collapsed_sz", cb.getInt(2))
    p("sum_mult", cb.getLong(3))
    p("buckets_build_s", (System.nanoTime() - t2) / 1e9)

    // size histogram of the collapsed arrays (log2 buckets): where the
    // quadratic mass lives
    buckets.select((floor(log2(size(col("ids")))).cast("int")).as("lg"),
        expr("cast(size(ids) as bigint) * (cast(size(ids) as bigint) - 1) div 2")
          .as("pairs"))
      .groupBy("lg").agg(count(lit(1)).as("arrays"), sum("pairs").as("pairs"))
      .orderBy("lg").collect()
      .foreach(r => p(s"sz_2^${r.getInt(0)}",
        s"arrays=${r.getLong(1)} pairs=${r.getLong(2)}"))
    spark.stop()
  }
}
