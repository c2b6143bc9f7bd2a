package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef

/** Graph analytics over engine-derived edge lists (the similarity /
  * dedup graphs the other operator families produce). Iterative jobs
  * follow the same discipline as [[graft.dedup.Dedup.connectedComponents]]:
  * edge state is computed once, cached pre-partitioned on the join key,
  * lineage is truncated periodically, and every intermediate cache is
  * dropped once the final state is materialized.
  */
object Graph {

  /** Distributed PageRank over a directed edge list (`src`, `dst`
    * columns). Rank convention sums to N (teleport term `1 − d` per
    * node), so scores are comparable across graph sizes.
    *
    * Scale shape: out-degrees join the edges ONCE and the result is
    * cached already hash-partitioned on `src` (the degree join's own
    * exchange), so each of the `nIter` rounds shuffles only the O(N)
    * rank table — edges never move again. Dangling mass (nodes with no
    * out-edges) is folded back through a 1-row broadcast aggregate
    * inside the plan — no per-iteration driver action. The final state
    * is localCheckpoint-materialized so all intermediates unpersist
    * before returning.
    */
  def pageRank(edges0: DataFrame, nIter: Int = 10, damping: Double = 0.85,
      handleDangling: Boolean = true): DataFrame = {
    // cache the INPUT edge list first: deg, withDeg and nodes all scan it,
    // and an expensive upstream (e.g. the kNN-graph window) must run once,
    // not three times. A caller-cached input is respected (and not
    // unpersisted on exit).
    val preCached = edges0.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val edges =
      if (preCached) edges0.toDF("src", "dst") else edges0.toDF("src", "dst").cache()
    val sess = edges.sparkSession
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").cache()
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct().cache()
    val n = nodes.count()
    withDeg.count() // fill the edge cache under FULL parallelism
    // Size the iteration shuffles to the RANK TABLE's volume, not the
    // session default: cached/checkpointed plans don't get AQE's
    // post-shuffle coalescing, so a small graph would otherwise pay
    // nIter × shufflePartitions near-empty tasks. ~50k ranks per
    // partition, capped at 4× the cluster's parallelism for huge graphs.
    val parts = math.max(1L, math.min(n / 50000L + 1L,
      sess.sparkContext.defaultParallelism * 4L)).toString
    val prevParts = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.shuffle.partitions", parts)
    try {
    var ranks = nodes.withColumn("rank", lit(1.0))
    var iter = 0
    while (iter < nIter) {
      // ONE join + ONE aggregate per round: in-contributions union a zero
      // row per node (keeps no-in-edge nodes without a second join), then
      // one keyed sum. The union's zero side reuses the cached nodes scan.
      val contrib = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .unionByName(nodes.withColumn("c", lit(0.0)))
        .groupBy("id")
        .agg(sum("c").as("inc"))
      // handleDangling=false skips an anti-join + 1-row broadcast PER
      // ITERATION — pass it when the graph has no sink nodes by
      // construction (a kNN graph: every neighbor also has neighbors).
      var next = (if (handleDangling) {
        val danglingMass = ranks
          .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
          .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
        contrib.crossJoin(broadcast(danglingMass))
      } else contrib.withColumn("dm", lit(0.0)))
        .select(col("id"),
          (lit(1 - damping) + lit(damping) *
            (col("inc") + col("dm") / n)).as("rank"))
      // truncate lineage: one join+agg of plan depth per iteration
      // otherwise (connectedComponents precedent)
      next = if ((iter + 1) % 4 == 0) next.localCheckpoint() else next.cache()
      ranks.unpersist()
      ranks = next
      iter += 1
    }
    val out = ranks.localCheckpoint() // materialize, then drop the caches
    ranks.unpersist()
    withDeg.unpersist()
    nodes.unpersist()
    if (!preCached) edges.unpersist()
    out
    } finally sess.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  // q78 — SIMILARITY-GRAPH CENTRALITY: PageRank over the approximate
  // kNN graph (q57's edges) picks the corpus's most "referenced"
  // vectors — the representative-selection / coreset shape for data
  // curation (a vector many others count among their nearest neighbors
  // is central to its region). 10 rounds, damping 0.85; ranks sum to N
  // and the distributed fixpoint is spec-matched against a driver-side
  // dense reference on the full sf0.001 graph (GraphSpec). Iterative →
  // rows-only; rank rounded to 8 (sum-order jitter) with id tiebreak.
  val q78: QueryDef = QueryDef.rowsOnly("q78_graph_centrality") { (s, d) =>
    val edges = graft.sim.Similarity.approxKnnGraphCached(s, d, 3)
    pageRank(edges, nIter = 10, damping = 0.85, handleDangling = false)
      .select(col("id").as("vec_id"), round(col("rank"), 8).as("rank"))
      .orderBy(desc("rank"), asc("vec_id"))
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(q78)
}
