package graft

/** Plan-shape regression guards: the physical plans that matter at scale
  * must keep their shape (pushdown reaching the scan, broadcast star
  * joins, top-k without a global sort).
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 pushes both predicates into the parquet scan") {
    val plan = planOf("q02_filter_project")
    // (the simple plan string truncates long PushedFilters lists)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_discount), " +
      "GreaterThanOrEqual(l_quantity,47.0)"), s"missing pushed filters in:\n$plan")
    assert(!plan.contains("l_shipdate"), "projection should prune unused columns")
  }

  test("q05 snowflake joins broadcast the dimensions") {
    val plan = planOf("q05_multi_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts in:\n$plan")
  }

  test("q50 top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q50_knn_brute")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$plan")
  }

  test("q01 aggregates partially before the exchange") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("partial_sum"), s"no map-side partial aggregation in:\n$plan")
  }

  test("q24 batch index has no window (nothing funnels through one task)") {
    val plan = planOf("q24_batch_index")
    assert(!plan.contains("Window"), s"q24 must not plan a window:\n$plan")
  }

  test("q76 exact companion counts only the sketch's 20 picks (no O(vocab) exchange)") {
    val plan = planOf("q76_heavy_hitters")
    // the 20-term IN-set filter must sit UNDER the counting aggregate,
    // so the exchange moves ≤ 20 keys' partials, never the vocabulary
    assert(plan.contains("INSET"),
      s"missing the selected-terms filter under the exact count:\n$plan")
    assert(plan.contains("partial_count"),
      s"exact counts must combine map-side:\n$plan")
  }

  test("q12 percentiles never buffer raw values: no ObjectHashAggregate, counts aggregate partially") {
    val plan = planOf("q12_percentiles")
    // the one-pass percentile(...) plans an ObjectHashAggregate whose
    // buffer holds every raw value of a group in one task — the exact
    // shape the two-pass rewrite exists to avoid
    assert(!plan.contains("ObjectHashAggregate"),
      s"q12 must not plan a value-buffering aggregate:\n$plan")
    assert(plan.contains("partial_count"),
      s"(group, value) counts must combine map-side:\n$plan")
    assert(plan.contains("Window"),
      s"the ordered prefix-sum must be a (spillable) window:\n$plan")
    // the final groupBy must REUSE the window's hash partitioning:
    // above the Window there is a partial+final max pair but NO
    // exchange between them and the window
    val aboveWindow = plan.substring(0, plan.indexOf("Window ["))
    val aggIdx = aboveWindow.indexOf("HashAggregate")
    assert(aggIdx >= 0, s"q12 final aggregate missing above the window:\n$plan")
    assert(!aboveWindow.substring(aggIdx).contains("Exchange"),
      s"q12's final agg must reuse the window's partitioning, not re-shuffle:\n$plan")
    // total hash exchanges stay at two — the map-side-combined counts
    // build on (group, value) and the window's group repartition; a
    // third means someone re-added a shuffle
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 2,
      s"q12 must plan exactly TWO hash exchanges (counts build + window), got $hashEx:\n$plan")
  }

  test("q108 percentile buffers hold the O(keys) count table, never raw rows") {
    val plan = planOf("q108_skew_report")
    // q108 keeps the value-buffering percentile_disc aggregate ON
    // PURPOSE — its input is the per-key count table (one row per
    // distinct join key), so the buffer is bounded by O(keys), the same
    // bound the report itself measures. The q12 OOM class creeps back
    // in only if percentiles start aggregating a raw-row column:
    // every percentile in the plan must consume `cnt`
    val pcts = "percentile_disc\\(\\s*([A-Za-z_][A-Za-z0-9_]*)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(pcts.nonEmpty, s"q108 lost its percentile aggregates:\n$plan")
    assert(pcts.forall(_ == "cnt"),
      s"q108 percentiles must aggregate the count table only, got inputs $pcts:\n$plan")
    assert(plan.contains("partial_count"),
      s"the one real shuffle must combine map-side:\n$plan")
  }

  test("q52 kNN graph: broadcast pair join + map-side bounded top-k aggregate") {
    val plan = planOf("q52_knn_self_join")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"no broadcast pair join in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"top-k should partial-aggregate with bounded object buffers (no pair sort):\n$plan")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window("),
      s"the sorted-window formulation should be gone:\n$plan")
  }

  test("q41 candidates expand from bucket arrays (triangle chunks), never a pair join") {
    val plan = planOf("q41_dedup_ngram_jaccard")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q41 candidates must come from MinHash band buckets, not an all-pairs join:\n$plan")
    // the funnel head is the triangle decomposition: buckets collapse to
    // sorted id arrays, chunk pairs ROUND-ROBIN before expansion (the
    // sf10 de-skew) — so pair generation is Generate (explode) work
    // after a RoundRobinPartitioning exchange, and no join on (band,
    // key) exists anywhere in the plan
    assert(plan.contains("RoundRobinPartitioning"),
      s"chunk pairs must round-robin before expansion:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Join") && l.contains("band") && l.contains("key")),
      s"the band self-join should be gone (replaced by the triangle explode):\n$plan")
    // grams still join in AFTER pair generation, keyed by doc_id only
    assert(plan.contains("Generate explode"),
      s"pair expansion must be a Generate:\n$plan")
  }

  test("q44 blocked dedup plans no cartesian pair join") {
    val plan = planOf("q44_dedup_embedding")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q44 candidates must come from LSH buckets, not an all-pairs join:\n$plan")
  }

  test("q54/q55 PQ index build is a pure DataFrame plan — no RDD scan") {
    // the PqEncode expression keeps the encode inside a codegen'd
    // projection; an RDD mapPartitions pass would surface as
    // ExistingRDD/SerializeFromObject and pay an O(n) re-encode per query
    for (q <- Seq("q54_pq_ann", "q55_ivfpq_ann")) {
      val plan = planOf(q)
      assert(!plan.contains("ExistingRDD") && !plan.contains("SerializeFromObject"),
        s"$q must not round-trip through an RDD:\n$plan")
    }
  }

  test("q38/q59/q69 corpus-stat operators broadcast the stats, never shuffle-join the corpus") {
    for (q <- Seq("q38_embedding_outliers", "q59_domain_mix", "q69_bm25")) {
      val plan = planOf(q)
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q must join its O(groups)/1-row stats by broadcast, not a corpus shuffle:\n$plan")
      assert(plan.contains("BroadcastExchange"),
        s"$q stats should broadcast:\n$plan")
    }
  }

  test("q77 SQ8 candidate stage scans the persisted code table, never raw vectors") {
    val plan = sim.Similarity.sq8Candidates(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embedding"),
      s"candidate scan must read codes only — raw vectors are rerank-only:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-50 should be partition heaps, not a global sort:\n$plan")
  }

  test("q101 vocab cap is TakeOrderedAndProject feeding the id window, one exchange") {
    val plan = planOf("q101_vocab_build")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the vocab cap must be partition heaps, not a global sort:\n$plan")
    // the id-assigning window reads only the capped (bounded) set: it
    // must sit ABOVE the TakeOrderedAndProject in the plan text
    val winAt = plan.indexOf("Window")
    val topAt = plan.indexOf("TakeOrderedAndProject")
    assert(winAt >= 0 && topAt >= 0 && winAt < topAt,
      s"window must consume the capped set, not the raw term counts:\n$plan")
  }

  test("q100 NSW hop prunes to the frontier's buckets at the adjacency scan") {
    sim.Similarity.nswTables(spark, sfDir) // ensure built
    val plan = sim.Similarity.nswHop(spark, sfDir, Seq(1L, 2L, 3L))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("pbucket") && l.contains(" IN ")),
      s"hop scan must prune to the frontier's pbucket partitions:\n$plan")
  }

  test("q102 batch hop broadcasts the frontier; the adjacency never shuffles") {
    import org.apache.spark.sql.functions._
    val (adjT, _) = sim.Similarity.nswTables(spark, sfDir)
    val frontier = Tables.embeddings(spark, sfDir).limit(3)
      .select(col("vec_id").as("qid"), col("vec_id").as("node"),
        col("embedding").as("qvec"),
        sqrt(graft.functions.VectorExprs.dotProduct(
          col("embedding"), col("embedding"))).as("qnrm"))
    val plan = sim.Similarity.nswBatchHop(spark, adjT, frontier, Seq(1L, 2L, 3L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier must broadcast against the adjacency:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"adjacency side must stream, never shuffle:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("pbucket") && l.contains(" IN ")),
      s"batch hop must prune to the frontier's pbucket partitions:\n$plan")
  }

  test("q104 incremental agg: only the delta side shuffles, the snapshot scan is exchange-free") {
    val plan = planOf("q104_incremental_agg")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // a from-scratch refresh would shuffle the whole orders table into
    // the aggregate; the incremental merge may exchange ONLY the
    // O(delta-keys) aggregate to meet the snapshot's bucketing
    assert(hashExchanges <= 1,
      s"expected at most one hash exchange (the delta side), got $hashExchanges:\n$plan")
    assert(plan.contains("FullOuter") || plan.contains("full_outer"),
      s"merge must be a full-outer join to admit new keys:\n$plan")
  }

  test("q56 persisted-index probe prunes partitions at the scan") {
    val plan = planOf("q56_ann_index_probe")
    // above inSetConversionThreshold (10) the optimizer renders the probe
    // list as INSET rather than IN — both are the same partition pruning
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cell_id") &&
          (l.contains(" IN ") || l.contains("INSET"))),
      s"probe must push cell_id IN/INSET (...) as PartitionFilters:\n$plan")
  }

  test("q133 batch IVF broadcasts the probe table; corpus never hash-shuffles before the join") {
    val plan = planOf("q133_ivf_batch_ann")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe table must broadcast onto the corpus scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cell match must be an equi-join:\n$plan")
    // hash exchanges: the (tiny) query-side cell-ranking window + the
    // per-query top-k window over join output — never the corpus scan
    val hashExchanges = plan.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange hashpartitioning") ||
        l.trim.startsWith(":- Exchange hashpartitioning") ||
        l.trim.startsWith("Exchange hashpartitioning"))
    assert(hashExchanges <= 2,
      s"expected at most 2 hash exchanges (query ranking + final top-k), got $hashExchanges:\n$plan")
  }

  test("q58 balanced sample assigns cells without a cross join, caps map-side") {
    val plan = planOf("q58_balanced_sample")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cell assignment must be a projection, not a seed join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-cell quota should push a map-side group limit:\n$plan")
  }

  test("q53 IVF cell assignment plans no window and no cross join") {
    val plan = planOf("q53_ivf_ann")
    assert(!plan.contains("Window"), s"q53 assignment must be a projection, not a window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q53 must not expand rows through a cross join:\n$plan")
  }

  test("q73 packs with exactly one data exchange (the shard window)") {
    val plan = planOf("q73_sequence_pack")
    assert(plan.contains("Window"), s"expected the per-shard window:\n$plan")
    // one hash exchange for the window; the trailing range exchange is
    // the output ORDER BY
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx:\n$plan")
  }

  test("q39 hashed features never build a vocabulary join") {
    val plan = planOf("q39_hashed_features")
    assert(!plan.contains("Join"), s"feature hashing must be join-free:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("q79 weighted sample is a shuffle-free TakeOrdered over one scan") {
    val plan = planOf("q79_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$plan")
    assert(!plan.contains("Exchange"), s"weighted sampling must not shuffle the corpus:\n$plan")
  }

  test("q74 modality routing partitions on (modality, salt)") {
    // the decode is an RDD pass (Scan ExistingRDD hides its input plan),
    // so assert the exchange on the routing stage itself
    val plan = multimodal.Binary.routedPayloads(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(modality"),
      s"expected the modality-pure salted repartition:\n$plan")
  }

  test("q117 gram probe broadcasts the test-side grams; the corpus never shuffles on grams") {
    val plan = planOf("q117_leakage_split")
    // the train-side exploded grams probe a broadcast of the (bounded)
    // test gram set — a SortMergeJoin here would shuffle O(corpus grams)
    assert(plan.contains("BroadcastHashJoin"),
      s"test grams must broadcast against the train probe:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q117 must never shuffle the exploded corpus on gram:\n$plan")
  }

  test("q115 budget stage windows only the boundary-pruned candidates, never the full survivor set") {
    // the catalog entry evaluates eagerly and returns a local relation
    // (cache lifetime stays inside the call); the lazy builder exposes
    // the composed plan this guard must inspect
    val plan = graft.dedup.Dedup.curationFunnel(spark, sfDir, eager = false)
      .queryExecution.executedPlan.toString
    // the naive stage-4 shape — Window.partitionBy(source) over EVERY
    // surviving document — is a multi-TB single-task sort per source at
    // 100 TB. The plan must show exactly one Window (the budget cumsum)
    // and its input subtree must carry the q103 boundary filter
    // (qkey >= tmin against the broadcast boundary table).
    val wins = "Window".r.findAllIn(plan).size
    assert(wins == 1, s"expected exactly one Window (the budget stage), got $wins:\n$plan")
    val below = plan.split("Window", 2)(1)
    assert(below.contains("tmin"),
      s"the budget window must consume the boundary-pruned candidates (qkey >= tmin):\n$plan")
  }

  test("q197 rolling active: pair explode + broadcast day filter, no range window") {
    val plan = planOf("q197_rolling_active")
    // the 7-day window forms by exploding each (day, user) pair to the
    // ≤7 windows it serves and broadcast-filtering observed days — never
    // a COUNT DISTINCT OVER RANGE window (one task per frame) and never
    // a days x pairs range join
    assert(plan.contains("Generate explode"),
      s"windows must form by exploding the pair set:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the observed-day filter must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no range window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"no unkeyed join:\n$plan")
    assert(plan.contains("partial_count"),
      s"per-day counts must combine map-side:\n$plan")
  }

  test("q196 cdc apply compacts with a hash aggregate, never a sort-based one") {
    val plan = planOf("q196_cdc_apply")
    // the op-log compaction must be ONE hash aggregate on the key with
    // map-side partials — max_by over the op STRING would put a string
    // in the aggregation buffer and silently demote to SortAggregate
    // (a per-partition corpus sort before the partials); the int-flag
    // encoding keeps the buffer mutable-primitive
    assert(!plan.contains("SortAggregate"),
      s"compaction demoted to sort-based aggregation:\n$plan")
    assert("partial_max_by".r.findAllIn(plan).nonEmpty,
      s"expected map-side max_by partials:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange (the key compaction):\n$plan")
    assert(!plan.contains("Window"), s"no window in the compaction:\n$plan")
  }

  test("q121 shuffle shard: the shard window is the ONLY hash exchange (no global sort rank)") {
    val plan = planOf("q121_shuffle_shard")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1,
      s"expected exactly one hash exchange (the shard window), got $hashEx:\n$plan")
    // the naive plan ranks over one global order — a single-partition
    // window that cannot scale; partitioning must be by shard
    assert(plan.contains("hashpartitioning(shard"),
      s"window must partition by shard:\n$plan")
    assert(!plan.contains("SinglePartition") || !plan.contains("row_number"),
      s"no single-partition rank allowed:\n$plan")
  }

  test("q122 multi-benchmark gram probe broadcasts the tagged eval grams") {
    val plan = planOf("q122_contamination_report")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams must broadcast against the train probe:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q122 must never shuffle the exploded corpus on gram:\n$plan")
  }

  test("q126 novelty aggregates partially map-side and bounds its exchanges") {
    val plan = planOf("q126_ngram_novelty")
    // the min(doc_id)-per-shingle must combine map-side — without the
    // partial the full gram stream crosses the wire unreduced
    assert(plan.contains("partial_min"),
      s"first-occurrence min must aggregate partially:\n$plan")
    assert(plan.contains("partial_count"),
      s"doc rollup must aggregate partially:\n$plan")
    // two hash exchanges (shingle agg + doc rollup) at broadcast-stats
    // scale; a third appears when stats push the attribution join to a
    // shuffle join — anything beyond that means a lost reuse
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 3, s"expected <=3 hash exchanges, got $hashEx:\n$plan")
  }

  test("q123 OOV probe broadcasts the bounded vocab; the token stream never shuffles on term") {
    val plan = planOf("q123_oov_rate")
    // the ≤32k vocab is TakeOrdered-capped then broadcast; the exploded
    // corpus probes it map-side — a term-keyed SortMergeJoin would
    // shuffle the whole token stream
    assert(plan.contains("TakeOrderedAndProject"),
      s"the vocab cap must be partition heaps:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast against the token probe:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q123 must never shuffle the token stream on term:\n$plan")
  }

  test("q137 reads the corpus once: every derivation feeds from the materialized aggregate") {
    val plan = planOf("q137_source_divergence")
    // the (source, term) counts localCheckpoint once; the six derived
    // tables (both distribution sides, source lists, term list, totals)
    // must all read that materialized RDD — a FileScan in the final plan
    // means some branch re-planned the corpus explode (the first cut
    // re-scanned parquet SEVEN times)
    assert(!plan.contains("FileScan"),
      s"a derivation re-scans the corpus instead of the checkpointed aggregate:\n$plan")
    assert(plan.contains("partial_sum"),
      s"the JS sum must combine map-side:\n$plan")
  }

  test("q138 sweeps five thresholds over ONE pair pass (single BNLJ, single Jaccard chain)") {
    val plan = planOf("q138_dedup_threshold_sweep")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj === 1, s"expected exactly 1 threshold BNLJ, got $bnlj:\n$plan")
    // the candidate-pair Jaccard subtree must appear once (condition +
    // projection reference the same chain) — five separate dedup runs
    // would plan five
    val jacc = "JaccardSim\\(|jaccardsim\\(".r.findAllIn(plan).size
    assert(jacc <= 2, s"pair Jaccard chain duplicated ($jacc occurrences):\n$plan")
  }

  test("q141 triangle census joins on vertex keys, never a cartesian") {
    val plan = planOf("q141_knn_triangles")
    assert(!plan.contains("CartesianProduct"),
      s"triangle wedge join must be keyed, not cartesian:\n$plan")
    assert(plan.contains("partial_count"),
      s"degree/triangle counts must combine map-side:\n$plan")
  }

  test("q149 PMI: unigram/total tables broadcast back, top-20 is TakeOrdered") {
    val plan = planOf("q149_pmi_collocations")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be partition heaps, not a global sort:\n$plan")
    val bcasts = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bcasts >= 3,
      s"unigram (x2) + corpus totals must join broadcast, got $bcasts:\n$plan")
    assert(plan.contains("partial_count"),
      s"bigram counts must combine map-side:\n$plan")
  }

  test("q150 winsorized stats: window runs on the count table, cuts broadcast back") {
    val plan = planOf("q150_winsorized_stats")
    assert(plan.contains("partial_count"),
      s"(source, n_chars) counts must combine map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"percentile cuts must broadcast onto the count table:\n$plan")
    // the count table feeds both the cuts and the means; AQE must REUSE
    // the count-table exchange at runtime rather than recompute the scan
    val df = SparkEntry.queries("q150_winsorized_stats")(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange"),
      s"count-table exchange must be reused, not recomputed:\n$finalPlan")
  }

  test("q152/q156 per-row projections plan no hash exchange at all") {
    for (name <- Seq("q152_char_entropy", "q156_jl_projection")) {
      val plan = planOf(name)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$name must be a pure projection + sort:\n$plan")
      assert(plan.split("FileScan parquet").length == 2,
        s"$name must scan exactly once:\n$plan")
    }
  }

  test("q157 drift: per-dim aggregate combines map-side, output exchange is O(dims)") {
    val plan = planOf("q157_embedding_drift")
    assert(plan.contains("partial_"),
      s"per-dim means must combine map-side before the exchange:\n$plan")
    assert(plan.split("FileScan parquet").length == 2,
      s"one corpus scan expected:\n$plan")
  }

  test("q148 kNN classify: labels broadcast, vote window never sees the corpus join") {
    val plan = planOf("q148_knn_classify")
    val bcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bcasts >= 2, s"label joins must broadcast, got $bcasts:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"neighbor top-k must ride the bounded TopKNbr aggregate:\n$plan")
  }

  test("q172 basket rules: part broadcast, map-side pair partials, top-20 as TakeOrdered") {
    val plan = planOf("q172_market_basket")
    // the basket subtree sits behind a lazy localCheckpoint since r14
    // (three consumers shared one corpus scan) — pin its broadcast shape
    // on the factored builder, and the downstream shape on the outer plan
    val basketPlan = operators.Relational
      .q172Baskets(spark, sfDir).queryExecution.executedPlan.toString
    assert(basketPlan.contains("BroadcastHashJoin"),
      s"part dimension must broadcast onto lineitem:\n$basketPlan")
    assert(plan.contains("partial_count"),
      s"pair counts must combine map-side (O(brands²) keys):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"only the 1-row n_orders crossJoin may appear (as BNLJ):\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD"),
      s"the shared basket table must be checkpoint-shared, not recomputed per branch:\n$plan")
  }

  test("q173 profile: one corpus scan, multi-distinct rides one Expand") {
    val plan = planOf("q173_column_profile")
    assert(plan.split("Scan parquet").length == 2,
      s"the profiler must read orders exactly once:\n$plan")
    assert(plan.contains("Expand"),
      s"multi-distinct must plan the single-pass Expand, not per-column jobs:\n$plan")
  }

  test("q174 affinity: dot products aggregate map-side, top-20 as TakeOrdered") {
    val plan = planOf("q174_brand_affinity")
    // cb sits behind a lazy localCheckpoint since r14 — pin the corpus
    // subtree's broadcast-dimension shape on the factored builder
    val cbPlan = operators.Relational
      .q174Cb(spark, sfDir).queryExecution.executedPlan.toString
    assert(cbPlan.contains("BroadcastHashJoin"),
      s"part dimension must broadcast onto lineitem in the cb build:\n$cbPlan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD"),
      s"the shared cb table must be checkpoint-shared, not recomputed per branch:\n$plan")
    assert(plan.contains("partial_sum"),
      s"dot aggregate must combine map-side:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must ride the per-customer explode, never a cross join:\n$plan")
  }

  test("q176 PIT join: custkey-keyed with the band residual, no range-join cartesian") {
    val plan = planOf("q176_scd2_point_in_time")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"PIT join must stay a keyed join with the band as residual predicate:\n$plan")
    assert(plan.contains("Window"),
      s"the interval table must come from the per-customer window build:\n$plan")
  }

  test("q178 coverage: sweep-line window partitions on user_id (real keys)") {
    val plan = planOf("q178_interval_coverage")
    assert(plan.contains("Window"), s"sweep-line must be a window pass:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"),
      s"the sweep window must partition on user_id, not run globally:\n$plan")
  }

  test("q179 peak concurrency: the corpus-sized cumsum partitions by hour") {
    val plan = planOf("q179_peak_concurrency")
    // the two-level decomposition: within-hour windows on real keys; the
    // only unpartitioned window runs over the O(hours) net table
    assert(plan.contains("hashpartitioning(hour"),
      s"within-hour cumsum must partition on hour:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"per-hour nets must combine map-side:\n$plan")
  }

  test("q180 AUC: one corpus exchange (score groupBy), cumsum on the bounded table") {
    val plan = planOf("q180_roc_auc")
    assert(plan.contains("partial_sum"),
      s"score histogram must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no pairwise join — the histogram rank-sum replaces it:\n$plan")
  }

  test("q181 concentration: cumulative windows run on the bucket table only") {
    val plan = planOf("q181_revenue_concentration")
    assert(plan.contains("partial_sum"),
      s"customer totals and bucket sums must combine map-side:\n$plan")
    assert(!plan.contains("hashpartitioning(o_custkey, "),
      s"windows must not run per-customer — buckets only:\n$plan")
  }

  test("q183 LTV triangle: the cumulative window runs on the cohort matrix, not per-customer") {
    val plan = planOf("q183_cohort_ltv")
    assert(plan.contains("hashpartitioning(cohort_m"),
      s"the cum window must partition on cohort_m:\n$plan")
    assert(!plan.contains("Window") || !plan.contains("hashpartitioning(o_custkey,"),
      s"no per-customer window may appear:\n$plan")
  }

  test("q185 weighted percentiles: rank windows partition per group over the bucket table") {
    val plan = planOf("q185_weighted_percentile")
    assert(plan.contains("hashpartitioning(flag"),
      s"cumulative weights must partition on the group key:\n$plan")
    assert(plan.contains("partial_sum"),
      s"bucket weights must combine map-side:\n$plan")
  }

  test("q190 CUSUM: one corpus aggregate feeds the bounded hour table") {
    val plan = planOf("q190_cusum_changepoint")
    assert(plan.contains("partial_count"),
      s"hourly counts must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"only broadcast 1-row joins allowed:\n$plan")
  }

  test("q193 perceptual near-dup: band-keyed pairs, never a cartesian") {
    val plan = planOf("q193_phash_near_dup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay inside band buckets:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"the band join must be keyed:\n$plan")
  }

  test("q195 MAD: rank windows carry bucket keys, stats broadcast back, histograms combine map-side") {
    val plan = planOf("q195_mad_outliers")
    // the catalog entry localizes the O(groups) med/mad stat tables, so
    // the quantile machinery runs inside those bounded driver reads; its
    // shape is asserted on the lazy exactGroupQuantile composition
    // directly: the only window touching histogram rows is keyed
    // (group, qbucket) — the per-group corpus-sized sort q12 tolerates
    // must not appear
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice"))
    val hist = o.groupBy("o_orderpriority", "o_totalprice")
      .agg(count(lit(1)).as("cnt"))
    val qplan = graft.operators.Relational.exactGroupQuantile(
      hist, Seq("o_orderpriority"), "o_totalprice", 0.5, "med")
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(o_orderpriority#\\d+, qbucket".r.findFirstIn(qplan).isDefined,
      s"boundary-bucket rank window must partition on (group, qbucket):\n$qplan")
    assert(qplan.contains("partial_count"),
      s"value histogram must combine map-side:\n$qplan")
    assert(plan.contains("partial_count"),
      s"deviation histogram must combine map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"median/MAD stat rows must broadcast back onto the fact:\n$plan")
  }

  test("q177 proration: both windows share the one orderkey exchange") {
    val plan = planOf("q177_exact_proration")
    // Σw, Σbase and the remainder rank all partition by l_orderkey — Spark
    // must plan them over a single hashpartitioning(l_orderkey) exchange
    val exchanges = "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"per-order windows must reuse one orderkey exchange, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("q204 prefix-filter: bucket-collapse pair plan, keyed joins, dict df combines map-side") {
    val plan = planOf("q204_prefix_filter_join")
    // the r12 dictionary rework moved the shingle-df aggregate into the
    // cached dict build (rankIds' zipWithIndex severs lineage), so q204's
    // own plan must show: the checkpointed per-doc artifact read back as
    // an RDD scan, a map-side-combined prefix-bucket build, the ARRAY
    // dedup (bucket collapse) before any pair exists, and keyed verify
    // joins — never a cartesian.
    assert(plan.contains("Scan ExistingRDD"),
      s"per-doc artifact must be the localCheckpoint scan:\n$plan")
    assert(plan.contains("partial_collect_set"),
      s"prefix-bucket build must combine map-side:\n$plan")
    assert("hashpartitioning\\(ids#".r.findFirstIn(plan).isDefined,
      s"duplicate prefix buckets must collapse via a distinct on the id arrays:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must form inside prefix-gram buckets, never a cartesian:\n$plan")
    // the df aggregate the old guard watched lives in the dict-build job
    val dictPlan = graft.dedup.Dedup.shingleVocabDf(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(dictPlan.contains("partial_count"),
      s"shingle df counts must combine map-side in the dict build:\n$dictPlan")
  }

  test("q205 ACF: one corpus aggregate, lags ride the bounded hour table") {
    val plan = planOf("q205_autocorrelation")
    assert(plan.contains("partial_count"),
      s"hourly counts must combine map-side:\n$plan")
    // the only corpus-sized exchange is the hour groupBy; everything
    // after runs on O(hours) rows, so no window may exist at all
    assert(!plan.contains("Window"), s"q205 must not plan a window:\n$plan")
  }

  test("q206 TWAP: the window and the per-user aggregate share one user exchange") {
    val plan = planOf("q206_time_weighted_avg")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toList
    val userExchanges = exchanges.count(_ => true)
    // exchanges: user_id (window+agg fused on one), bucket rollup —
    // anything more means the same-key reuse broke
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"the lead() window and per-user aggregate must share ONE user_id exchange:\n$plan")
  }

  test("q207 equi-depth: the cumulative window runs on the bucket table, not the corpus") {
    val plan = planOf("q207_equidepth_histogram")
    assert(plan.contains("partial_count"),
      s"bucket counts must combine map-side:\n$plan")
    // the single-partition window is the documented bounded exception —
    // its INPUT must be the bucket aggregate, so the window sits above
    // a HashAggregate, never directly above the scan
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, s"expected the bounded cumulative window:\n$plan")
    val below = plan.substring(winIdx)
    assert(below.contains("HashAggregate"),
      s"the window must consume the bucket aggregate:\n$plan")
  }

  test("q208 RRF: both funnels are TakeOrdered, the fusion join consumes them") {
    val plan = planOf("q208_rrf_fusion")
    // 3 = the two top-100 funnels + the final top-20 (full-outer join of
    // two 100-row lists may legitimately sort-merge — its inputs are
    // bounded; what must never happen is a corpus reaching the join)
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 3,
      s"both top-100 funnels and the final top-20 must be TakeOrderedAndProject:\n$plan")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 &&
      "TakeOrderedAndProject".r.findAllIn(plan.substring(joinIdx)).size >= 2,
      s"the fusion join must consume the two TakeOrdered funnels:\n$plan")
  }

  test("r11 stats family: each operator's plan scans its corpus exactly once") {
    // a derived stat table (totals, cutoffs, step-up max) must ride a
    // window over the bounded histogram, never an aggregate-and-join-back
    // that re-derives the corpus chain — the count pins it. q221's grid
    // localizes its bounded histogram eagerly, so its OUTPUT plan carries
    // ZERO file scans; q224 reads the fact plus its broadcast dim.
    val expect = Seq(
      "q220_kruskal_wallis" -> 1, "q221_kendall_tau" -> 0,
      "q222_bh_fdr" -> 1, "q223_brier_reliability" -> 1,
      "q224_target_encoding" -> 2, "q225_winsorized_mean" -> 1,
      "q226_cochran_armitage" -> 1, "q227_gini_best_split" -> 1)
    expect.foreach { case (name, n) =>
      val plan = planOf(name)
      val scans = "FileScan".r.findAllIn(plan).size
      assert(scans == n, s"$name: expected $n corpus scans, got $scans in:\n$plan")
    }
  }

  test("q227 argmax is a bounded TakeOrdered, never a global sort of thresholds") {
    val plan = planOf("q227_gini_best_split")
    assert(plan.contains("TakeOrderedAndProject"),
      s"LIMIT 1 over quantized gains must plan as TakeOrderedAndProject:\n$plan")
  }

  test("experimentation family: each operator's plan scans its corpus exactly once") {
    // same pin as the r11 stats family — grand moments/totals ride windows
    // over the bounded arm/nation/bucket tables, never an
    // aggregate-and-join-back that re-derives the corpus chain. q229 reads
    // orders + customer (the custkey join); q232's decile grid is a
    // Range, not a scan.
    val expect = Seq(
      "q228_cuped_adjustment" -> 1, "q229_eb_shrinkage" -> 2,
      "q230_tost_equivalence" -> 1, "q231_power_mde" -> 1,
      // q233 localizes its bounded hours table eagerly (q213/q221's
      // discipline), so its OUTPUT plan carries zero file scans
      "q232_gains_deciles" -> 1, "q233_pinball_backtest" -> 0,
      "q234_srm_check" -> 1, "q235_group_sequential" -> 1,
      "q237_quantile_treatment_effect" -> 1)
    expect.foreach { case (name, n) =>
      val plan = planOf(name)
      val scans = "FileScan".r.findAllIn(plan).size
      assert(scans == n, s"$name: expected $n corpus scans, got $scans in:\n$plan")
    }
  }
}
