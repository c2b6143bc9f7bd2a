package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The reference's data-prep surface, Spark-first.
  *
  * Mirrors gan.ipynb cell 2 (pixel /255 normalization = min-max scaling,
  * stratified 100-per-class sampling, train/test CSV split) and
  * dl4jGANComputerVision.java:66,372-400 (batchSizePerWorker mini-batching)
  * — re-expressed as distributed DataFrame plans: global stats are computed
  * as one aggregate row and broadcast-cross-joined back (never a
  * single-partition window over the fact table).
  */
object MlPrep {

  // q20 — min-max scaling: one tiny stats row, broadcast back over the fact.
  // Per-row (x-min)/(max-min) on identical doubles is IEEE-exact in both
  // engines, so scaled values stay unrounded.
  val q20: QueryDef = QueryDef.sql(
    "q20_minmax_scale",
    """SELECT l_orderkey, l_linenumber,
      |  (l_quantity - min(l_quantity) OVER ())
      |    / (max(l_quantity) OVER () - min(l_quantity) OVER ()) AS qty_scaled,
      |  (l_extendedprice - min(l_extendedprice) OVER ())
      |    / (max(l_extendedprice) OVER () - min(l_extendedprice) OVER ()) AS price_scaled
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, qty_scaled, price_scaled""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val stats = li.agg(
      min("l_quantity").as("qmin"), max("l_quantity").as("qmax"),
      min("l_extendedprice").as("pmin"), max("l_extendedprice").as("pmax"))
    li.crossJoin(broadcast(stats))
      .select(col("l_orderkey"), col("l_linenumber"),
        ((col("l_quantity") - col("qmin")) / (col("qmax") - col("qmin"))).as("qty_scaled"),
        ((col("l_extendedprice") - col("pmin")) / (col("pmax") - col("pmin"))).as("price_scaled"))
      .orderBy("l_orderkey", "l_linenumber", "qty_scaled", "price_scaled")
  }

  // q21 — grouped z-score standardization: per-group stats (rounded to kill
  // engine ulp noise) broadcast back; z itself stays exact.
  val q21: QueryDef = QueryDef.sql(
    "q21_standardize",
    """SELECT event_id, event_type,
      |  (value - mean_v) / std_v AS z
      |FROM events
      |JOIN (
      |  SELECT event_type AS et, round(avg(value), 6) AS mean_v,
      |    round(stddev_pop(value), 6) AS std_v
      |  FROM events GROUP BY event_type) g
      |ON event_type = et
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val stats = ev.groupBy(col("event_type").as("et"))
      .agg(round(avg("value"), 6).as("mean_v"), round(stddev_pop(col("value")), 6).as("std_v"))
    ev.join(broadcast(stats), col("event_type") === col("et"))
      .select(col("event_id"), col("event_type"),
        ((col("value") - col("mean_v")) / col("std_v")).as("z"))
      .orderBy("event_id")
  }

  // q22 — deterministic stratified sample: first n per class by key
  // [gan.ipynb cell 2 samples 100/class; deterministic analogue].
  val q22: QueryDef = QueryDef.sql(
    "q22_stratified_sample",
    """SELECT vec_id, label, rn FROM (
      |  SELECT vec_id, label,
      |    CAST(row_number() OVER (PARTITION BY label ORDER BY vec_id) AS INTEGER) AS rn
      |  FROM embeddings) t
      |WHERE rn <= 10
      |ORDER BY label, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("label").orderBy("vec_id")
    Tables.embeddings(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("vec_id", "label", "rn")
      .orderBy("label", "rn")
  }

  // q23 — deterministic hash train/test split (~80/20). Knuth
  // multiplicative hash on the key, engine-portable integer arithmetic.
  val q23: QueryDef = QueryDef.sql(
    "q23_train_test_split",
    """SELECT split, count(*) AS n,
      |  round(sum(CAST(o_totalprice AS DECIMAL(28,2))), 1)::double AS total
      |FROM (
      |  SELECT CASE WHEN ((o_orderkey % 1000003) * 2654435761) % 97 < 78
      |    THEN 'train' ELSE 'test' END AS split, o_totalprice
      |  FROM orders) t
      |GROUP BY split
      |ORDER BY split""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("split",
        when(((col("o_orderkey") % 1000003L) * 2654435761L % 97L) < 78, "train")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"),
        graft.functions.ExactSum.centSum(col("o_totalprice"), 2, 1).as("total"))
      .orderBy("split")
  }

  // q24 — mini-batch assignment (batchSize=200, java :66). A global
  // consecutive index WITHOUT a single-partition window: range-partition
  // and sort by key (parallel), then `zipWithIndex` — Spark computes
  // per-partition counts (one O(partitions) job) and adds prefix offsets
  // partition-locally. Every stage stays parallel; nothing funnels
  // through one task.
  val q24: QueryDef = QueryDef.sql(
    "q24_batch_index",
    """SELECT batch_id, count(*) AS n,
      |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
      |FROM (
      |  SELECT (row_number() OVER (ORDER BY o_orderkey) - 1) // 200 AS batch_id,
      |    o_orderkey
      |  FROM orders) t
      |GROUP BY batch_id
      |ORDER BY batch_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.orders(s, d)
      .select(col("o_orderkey"))
      .repartitionByRange(col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .rdd.map(_.getLong(0))
      .zipWithIndex()
      .toDF("o_orderkey", "idx")
      .withColumn("batch_id", floor(col("idx") / 200))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("first_key"),
        max("o_orderkey").as("last_key"))
      .orderBy("batch_id")
  }

  // q25 — covariance/correlation stats (PCA precursor; ipynb imports PCA).
  // Rounding scales chosen per magnitude so engine ulp noise collapses.
  val q25: QueryDef = QueryDef.sql(
    "q25_covariance",
    """SELECT l_returnflag,
      |  round(covar_pop(l_quantity, l_extendedprice), 2) AS cov_qty_price,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(stddev_pop(l_quantity), 4) AS std_qty,
      |  round(stddev_pop(l_extendedprice), 2) AS std_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(stddev_pop(col("l_quantity")), 4).as("std_qty"),
        round(stddev_pop(col("l_extendedprice")), 2).as("std_price"))
      .orderBy("l_returnflag")
  }

  // q26 — confusion matrix of a deterministic rule classifier vs labels
  // [ipynb cell 6 computes accuracy from argmax==label].
  val q26: QueryDef = QueryDef.sql(
    "q26_confusion_matrix",
    """SELECT label, (vec_id % 10) AS pred, count(*) AS n
      |FROM embeddings
      |GROUP BY label, vec_id % 10
      |ORDER BY label, pred""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .groupBy(col("label"), (col("vec_id") % 10).as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred")
  }

  // q27 — fixed-width bucketize + per-bucket stats.
  val q27: QueryDef = QueryDef.sql(
    "q27_feature_bucketize",
    """SELECT CAST(floor((p_retailprice - 900.0) / 10.0) AS BIGINT) AS bucket,
      |  count(*) AS n, min(p_retailprice) AS lo, max(p_retailprice) AS hi,
      |  round(sum(CAST(p_retailprice AS DECIMAL(28,2))), 2)::double AS total
      |FROM part
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .groupBy(floor((col("p_retailprice") - 900.0) / 10.0).as("bucket"))
      .agg(count(lit(1)).as("n"), min("p_retailprice").as("lo"),
        max("p_retailprice").as("hi"),
        graft.functions.ExactSum.centSum(col("p_retailprice"), 2, 2).as("total"))
      .orderBy("bucket")
  }

  // q32 — class balance audit: counts + priors (single double division).
  val q32: QueryDef = QueryDef.sql(
    "q32_label_distribution",
    """SELECT label, count(*) AS n,
      |  CAST(count(*) AS DOUBLE) / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings) AS prior
      |FROM embeddings
      |GROUP BY label
      |ORDER BY label""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val total = emb.agg(count(lit(1)).cast("double").as("total"))
    emb.groupBy("label").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(col("label"), col("n"), (col("n").cast("double") / col("total")).as("prior"))
      .orderBy("label")
  }

  // q39 — FEATURE HASHING (the hashing trick, sklearn HashingVectorizer
  // shape): token features hash into a fixed 256-bucket space with a
  // ±1 sign hash to debias collisions — the vectorizer whose width is
  // independent of vocabulary size, so at 100 TB there's no vocabulary
  // dictionary to build, broadcast, or shuffle; the single exchange is
  // the map-side-combined (doc, bucket) aggregation. Buckets come from
  // the engine-portable polynomial hash, so DuckDB replays the exact
  // vector: bucket = ph % 256, sign = parity of ph/256. Integer sums →
  // unrounded.
  val q39: QueryDef = QueryDef.sql(
    "q39_hashed_features",
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      |  FROM documents),
      |ph AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(t) + 1),
      |        c -> CAST(unicode(substr(t, CAST(c AS INT), 1)) AS BIGINT))),
      |      (a, b) -> (a * 131 + b) % 1000000007) AS h
      |  FROM tok)
      |SELECT doc_id, CAST(h % 256 AS INTEGER) AS bucket,
      |  CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS feat
      |FROM ph
      |GROUP BY doc_id, bucket
      |ORDER BY doc_id, bucket""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("t"))
      .select(col("doc_id"),
        graft.functions.VectorExprs.polyHash(col("t")).as("h"))
      .groupBy(col("doc_id"), (col("h") % 256).cast("int").as("bucket"))
      .agg(sum(when(expr("(h DIV 256) % 2") === 0, 1L).otherwise(-1L)).as("feat"))
      .orderBy("doc_id", "bucket")
  }

  // q121 — DETERMINISTIC GLOBAL TRAINING SHUFFLE: the epoch-order
  // assignment a trainer reads — every doc gets a (shard, pos) such that
  // reading shards in order, each ordered by pos, visits the corpus in a
  // pseudorandom but REPRODUCIBLE order (Knuth-multiplicative key on
  // doc_id; re-keying the constant = a new epoch permutation). The naive
  // shape is row_number() over one global order — a single-partition
  // window that dies at scale. This plan shards FIRST (shard = skey %
  // 16), then ranks only within each shard: the window partitions are
  // O(corpus/shards) and the shard count is a knob that scales with the
  // cluster (4096+ at 100 TB keeps each window partition ~25 GB → one
  // executor's spill-safe sort). One exchange total (the shard window's
  // hash partitioning).
  val q121: QueryDef = QueryDef.sql(
    "q121_shuffle_shard",
    """SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT) AS pos
      |FROM (
      |  SELECT doc_id,
      |    ((doc_id % 1000003) * 2654435761) % 1000000007 AS skey,
      |    CAST(((doc_id % 1000003) * 2654435761) % 1000000007 % 16 AS INTEGER) AS shard
      |  FROM documents) t
      |ORDER BY shard, pos""".stripMargin) { (s, d) =>
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"),
        ((col("doc_id") % 1000003L) * 2654435761L % 1000000007L).as("skey"))
      .withColumn("shard", (col("skey") % 16).cast("int"))
    keyed
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy("skey", "doc_id")).cast("long"))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  // q155 — k-FOLD cross-validation assignment + balance audit (the split
  // q23 generalizes to k folds, with the per-fold class-balance check a
  // CV harness needs before trusting fold estimates): fold = the same
  // engine-portable Knuth multiplicative hash mod 5, per-(fold, label)
  // counts in ONE map-side-combined shuffle bounded by folds·classes,
  // global label counts derive from that table (never a second corpus
  // pass), and max_dev = max over labels of |fold share − global share|
  // — exact-integer divisions, engine-identical unrounded, one round at
  // the end. A label absent from a fold contributes no dev row in either
  // engine (symmetric, and impossible at realistic fold sizes).
  val q155: QueryDef = QueryDef.sql(
    "q155_cv_folds",
    """WITH f AS (
      |  SELECT ((vec_id % 1000003) * 2654435761) % 5 AS fold, label
      |  FROM embeddings),
      |fl AS (SELECT fold, label, count(*) AS c FROM f GROUP BY 1, 2),
      |ft AS (SELECT fold, sum(c) AS nf FROM fl GROUP BY 1),
      |gl AS (SELECT label, sum(c) AS cg FROM fl GROUP BY 1),
      |tot AS (SELECT sum(c) AS n FROM fl)
      |SELECT fl.fold, CAST(min(ft.nf) AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS n_labels,
      |  round(max(abs(CAST(fl.c AS DOUBLE) / ft.nf
      |    - CAST(gl.cg AS DOUBLE) / tot.n)), 6) AS max_dev
      |FROM fl JOIN ft USING (fold) JOIN gl USING (label) CROSS JOIN tot
      |GROUP BY fl.fold
      |ORDER BY fold""".stripMargin) { (s, d) =>
    val f = Tables.embeddings(s, d)
      .select((col("vec_id") % 1000003L * 2654435761L % 5L).as("fold"),
        col("label"))
    val fl = f.groupBy("fold", "label").agg(count(lit(1)).as("c"))
    val ft = fl.groupBy("fold").agg(sum("c").as("nf"))
    val gl = fl.groupBy("label").agg(sum("c").as("cg"))
    val tot = fl.agg(sum("c").as("n"))
    fl.join(broadcast(ft), "fold")
      .join(broadcast(gl), "label")
      .crossJoin(broadcast(tot))
      .groupBy("fold")
      .agg(min("nf").as("n"), count(lit(1)).as("n_labels"),
        round(max(abs(col("c").cast("double") / col("nf")
          - col("cg").cast("double") / col("n"))), 6).as("max_dev"))
      .orderBy("fold")
  }

  // q162 — SEED-CENTROID similarity filtering (the CCNet/fastText-style
  // "does this look like my reference corpus" classifier, linearized: a
  // seed set defined by an integer-exact rule — stopword density ≥ 10%,
  // the natural-prose marker — gets its hashed-feature centroid, and
  // every document scores by cosine to it; keep = the score clears the
  // bar. No trained model state: the "classifier" IS the centroid, built
  // and applied in one job. Scale shape: q39's (doc, bucket) features are
  // the only corpus-sized exchange (map-side combined); the 256-bucket
  // centroid + its norm broadcast back; per-doc dot/norm is a second
  // map-side groupBy over the SAME feature table (AQE reuses the
  // exchange). Double sums over ≤256 bounded terms → round-6 is safe
  // (q157 precedent); the keep flag applies to the ROUNDED score.
  val q162: QueryDef = QueryDef.sql(
    "q162_seed_similarity_filter",
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
      |  FROM documents),
      |ph AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(t) + 1),
      |        c -> CAST(unicode(substr(t, CAST(c AS INT), 1)) AS BIGINT))),
      |      (a, b) -> (a * 131 + b) % 1000000007) AS h
      |  FROM tok),
      |feats AS (
      |  SELECT doc_id, CAST(h % 256 AS INTEGER) AS bucket,
      |    CAST(sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
      |  FROM ph GROUP BY 1, 2),
      |seed AS (
      |  SELECT doc_id, true AS seeded FROM (
      |    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      |    FROM documents) s
      |  WHERE len(list_filter(w, t -> t = 'the' OR t = 'a' OR t = 'value')) * 10
      |    >= len(w)),
      |cent AS (
      |  SELECT bucket, avg(CAST(v AS DOUBLE)) AS c
      |  FROM feats JOIN seed USING (doc_id) GROUP BY bucket),
      |cnorm AS (SELECT sqrt(sum(c * c)) AS cn FROM cent),
      |norms AS (
      |  SELECT doc_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS dn
      |  FROM feats GROUP BY 1),
      |dots AS (
      |  SELECT f.doc_id, sum(CAST(f.v AS DOUBLE) * cent.c) AS dot
      |  FROM feats f JOIN cent USING (bucket) GROUP BY 1)
      |SELECT n.doc_id,
      |  round(coalesce(d.dot, 0.0) / (n.dn * cnorm.cn), 6) AS seed_sim,
      |  coalesce(s.seeded, false) AS is_seed,
      |  round(coalesce(d.dot, 0.0) / (n.dn * cnorm.cn), 6) >= 0.5 AS keep
      |FROM norms n
      |LEFT JOIN dots d USING (doc_id)
      |LEFT JOIN seed s USING (doc_id)
      |CROSS JOIN cnorm
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val feats = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .select(col("doc_id"), graft.functions.VectorExprs.polyHash(col("t")).as("h"))
      .groupBy(col("doc_id"), (col("h") % 256).cast("int").as("bucket"))
      .agg(sum(when(expr("(h DIV 256) % 2") === 0, 1L).otherwise(-1L)).as("v"))
    val seed = docs
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("w"))
      .filter(expr("size(filter(w, t -> t = 'the' OR t = 'a' OR t = 'value')) * 10 >= size(w)"))
      .select(col("doc_id"), lit(true).as("is_seed"))
    val cent = feats.join(broadcast(seed.select("doc_id")), "doc_id")
      .groupBy("bucket").agg(avg(col("v").cast("double")).as("c"))
    val cnorm = cent.agg(sqrt(sum(col("c") * col("c"))).as("cn"))
    val norms = feats.groupBy("doc_id")
      .agg(sqrt(sum(col("v").cast("double") * col("v"))).as("dn"))
    val dots = feats.join(broadcast(cent), "bucket")
      .groupBy("doc_id").agg(sum(col("v").cast("double") * col("c")).as("dot"))
    val sim = round(coalesce(col("dot"), lit(0.0)) / (col("dn") * col("cn")), 6)
    norms
      .join(dots, Seq("doc_id"), "left")
      .join(broadcast(seed), Seq("doc_id"), "left")
      .crossJoin(broadcast(cnorm))
      .select(col("doc_id"), sim.as("seed_sim"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"),
        (sim >= 0.5).as("keep"))
      .orderBy("doc_id")
  }

  // q199 — ROBUST SCALING ((x − median) / IQR): the third standard
  // scaler next to q20 min-max and q21 z-score, and the one a pipeline
  // wants when the feature has heavy tails — mean/σ are themselves
  // dragged by the outliers being normalized (q195's masking argument
  // applied to scaling). All three per-group quantiles come from
  // exactGroupQuantile (q12's interpolation IEEE form — bit-equal to
  // DuckDB's quantile_cont), so the per-row (x − med)/(q3 − q1) is
  // IEEE-deterministic on identical inputs, unrounded by house rule.
  // Scale shape: ONE corpus shuffle builds the (type, value) histogram
  // (persisted across the three quantile passes, released before
  // return); the O(groups) stat table localizes (q195's pattern) and
  // broadcasts back onto the fact scan — the output projection is pure
  // map parallelism.
  val q199: QueryDef = QueryDef.sql(
    "q199_robust_scale",
    """SELECT event_id, event_type, (value - med) / (q3 - q1) AS rz
      |FROM events
      |JOIN (
      |  SELECT event_type AS et,
      |    quantile_cont(value, 0.25) AS q1,
      |    quantile_cont(value, 0.5) AS med,
      |    quantile_cont(value, 0.75) AS q3
      |  FROM events GROUP BY event_type) g
      |ON event_type = et
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val hist = ev.groupBy("event_type", "value")
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // all three quantiles of the SAME histogram in one bucket pass + one
    // boundary join (r13: the per-p helper ran the full chain three
    // times), localized once — same interpolation expressions, so the
    // stat values are bit-identical to the sequential form's
    val qdf = graft.operators.Relational.exactGroupQuantiles(
      hist, Seq("event_type"), "value",
      Seq(0.25 -> "q1", 0.5 -> "med", 0.75 -> "q3"))
      .select("event_type", "q1", "med", "q3")
    val rows = qdf.take(1024)
    require(rows.length < 1024, "stat-table driver read overflow")
    val stats = s.createDataFrame(java.util.Arrays.asList(rows: _*), qdf.schema)
      .withColumnRenamed("event_type", "et")
    hist.unpersist(false)
    ev.join(broadcast(stats), col("event_type") === col("et"))
      .select(col("event_id"), col("event_type"),
        ((col("value") - col("med")) / (col("q3") - col("q1"))).as("rz"))
      .orderBy("event_id")
  }

  // q214 — mutual information of each categorical part feature with a
  // binary price target (the feature-selection ranking the q25/q136
  // correlation family can't do for categoricals: MI is the
  // model-agnostic does-this-feature-carry-signal number, in nats, zero
  // iff independent). Target = retail price ≥ the documented fixed
  // 95000-cent threshold (the corpus midpoint — a stated contract, not a
  // data-dependent quantile). The three features unpivot via one stack
  // (ONE corpus scan, skinny rows) into a single (feature, value,
  // target) count aggregate — the only corpus shuffle; margins are
  // window sums over that bounded table (≤ ~180 cells/feature). Absent
  // cells contribute 0 (the 0·ln 0 MI convention — no smoothing needed,
  // unlike q213's PSI whose log sits over a ratio of the SAME cell).
  // Each cell's (c/N)·ln(cN/(c_v·c_t)) term is quantized onto the 1e-9
  // grid before the cross-cell sum (q211's order-free determinism);
  // per-feature MI is one exact integer sum scaled once, rounded once.
  val q214: QueryDef = QueryDef.sql(
    "q214_feature_mi",
    """WITH p AS (
      |  SELECT p_brand, p_type, CAST(p_size // 10 AS VARCHAR) AS sz,
      |    (CAST(round(p_retailprice * 100) AS BIGINT) >= 95000) AS t
      |  FROM part),
      |u AS (
      |  SELECT 'brand' AS feature, p_brand AS v, t FROM p
      |  UNION ALL SELECT 'ptype', p_type, t FROM p
      |  UNION ALL SELECT 'size_decade', sz, t FROM p),
      |c AS (
      |  SELECT feature, v, t, CAST(count(*) AS BIGINT) AS cvt
      |  FROM u GROUP BY 1, 2, 3),
      |w AS (
      |  SELECT feature, v, cvt,
      |    sum(cvt) OVER (PARTITION BY feature, v) AS cv,
      |    sum(cvt) OVER (PARTITION BY feature, t) AS ctt,
      |    sum(cvt) OVER (PARTITION BY feature) AS n
      |  FROM c),
      |terms AS (
      |  SELECT feature, v,
      |    CAST(round(1000000000.0
      |      * (CAST(cvt AS DOUBLE) / CAST(n AS DOUBLE))
      |      * ln((CAST(cvt AS DOUBLE) * CAST(n AS DOUBLE))
      |        / (CAST(cv AS DOUBLE) * CAST(ctt AS DOUBLE)))) AS BIGINT) AS t9
      |  FROM w)
      |SELECT feature, CAST(count(DISTINCT v) AS BIGINT) AS n_values,
      |  round(CAST(sum(t9) AS DOUBLE) / 1000000000.0, 6) AS mi_nats
      |FROM terms GROUP BY feature
      |ORDER BY feature""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d).select(
      col("p_brand"), col("p_type"),
      expr("cast(p_size div 10 as string)").as("sz"),
      expr("cast(round(p_retailprice * 100) as bigint) >= 95000").as("t"))
    val u = p.select(expr(
      "stack(3, 'brand', p_brand, 'ptype', p_type, 'size_decade', sz)")
      .as(Seq("feature", "v")), col("t"))
    val c = u.groupBy("feature", "v", "t").agg(count(lit(1)).as("cvt"))
    val w = c
      .withColumn("cv", sum("cvt").over(Window.partitionBy("feature", "v")))
      .withColumn("ctt", sum("cvt").over(Window.partitionBy("feature", "t")))
      .withColumn("n", sum("cvt").over(Window.partitionBy("feature")))
    def dbl(c0: String) = col(c0).cast("double")
    val terms = w.select(col("feature"), col("v"),
      round(lit(1000000000.0) * (dbl("cvt") / dbl("n"))
        * log((dbl("cvt") * dbl("n")) / (dbl("cv") * dbl("ctt"))))
        .cast("bigint").as("t9"))
    terms.groupBy("feature")
      .agg(countDistinct("v").as("n_values"), sum("t9").as("s9"))
      .select(col("feature"), col("n_values"),
        round(col("s9").cast("double") / 1000000000.0, 6).as("mi_nats"))
      .orderBy("feature")
  }

  // q223 — Brier score with its Murphy decomposition (reliability −
  // resolution + uncertainty) for a leakage-safe binned probability
  // scorer (the CALIBRATION audit q201's rank-normalization and q180's
  // AUC both skip: AUC says the scorer ORDERS well, this says whether
  // its probabilities MEAN what they claim — the difference between a
  // ranking model and one you can threshold at a stated risk level).
  // Structure: a train/test split on orderkey parity (the q23/q202
  // deterministic-split convention — no RNG, replays exactly), the
  // scorer is the train-side Laplace-smoothed urgent-rate per 10000-cent
  // value bucket p̂_b = (u+1)/(n+2), evaluated on the held-out side.
  // All inputs are exact integer counts off ONE corpus aggregate to the
  // bounded (bucket × split) table; every per-bin term (Brier mass,
  // reliability, resolution) is quantized onto the 1e-9 grid before its
  // cross-bin sum (q213's order-free determinism), and the four outputs
  // are single identical-operand-order expressions rounded once. The
  // Murphy identity brier = rel − res + unc holds to quantization error
  // (spec-pinned at 1e-6); test buckets unseen in train score the prior
  // 1/2 by the same smoothing formula, stated in the contract.
  val q223: QueryDef = QueryDef.sql(
    "q223_brier_reliability",
    """WITH o AS (
      |  SELECT o_orderkey % 2 = 0 AS train,
      |    CAST(round(o_totalprice * 100) AS BIGINT) // 10000 AS vb,
      |    CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS y
      |  FROM orders),
      |h AS (
      |  SELECT vb,
      |    CAST(count(CASE WHEN train THEN 1 END) AS BIGINT) AS n_tr,
      |    CAST(sum(CASE WHEN train THEN y ELSE 0 END) AS BIGINT) AS u_tr,
      |    CAST(count(CASE WHEN NOT train THEN 1 END) AS BIGINT) AS n_te,
      |    CAST(sum(CASE WHEN NOT train THEN y ELSE 0 END) AS BIGINT) AS u_te
      |  FROM o GROUP BY vb),
      |hw AS (
      |  SELECT h.*,
      |    CAST(sum(n_tr) OVER () AS BIGINT) AS ntr,
      |    CAST(sum(n_te) OVER () AS BIGINT) AS nte,
      |    CAST(sum(u_te) OVER () AS BIGINT) AS ute,
      |    CAST(count(CASE WHEN n_te > 0 THEN 1 END) OVER () AS BIGINT) AS nbins
      |  FROM h),
      |terms AS (
      |  SELECT vb, n_te, u_te, ntr, nte, ute, nbins,
      |    CAST(u_tr + 1 AS DOUBLE) / CAST(n_tr + 2 AS DOUBLE) AS ph,
      |    CAST(u_te AS DOUBLE) / CAST(n_te AS DOUBLE) AS yb,
      |    CAST(ute AS DOUBLE) / CAST(nte AS DOUBLE) AS ybar
      |  FROM hw WHERE n_te > 0),
      |q AS (
      |  SELECT ntr, nte, ute, nbins,
      |    CAST(round(1000000000.0 * (CAST(u_te AS DOUBLE) * (1.0 - ph) * (1.0 - ph)
      |      + CAST(n_te - u_te AS DOUBLE) * ph * ph)) AS BIGINT) AS br9,
      |    CAST(round(1000000000.0 * CAST(n_te AS DOUBLE)
      |      * (ph - yb) * (ph - yb)) AS BIGINT) AS rel9,
      |    CAST(round(1000000000.0 * CAST(n_te AS DOUBLE)
      |      * (yb - ybar) * (yb - ybar)) AS BIGINT) AS res9
      |  FROM terms)
      |SELECT ntr AS n_train, nte AS n_test, nbins AS n_bins,
      |  round(CAST(sum(br9) AS DOUBLE) / 1000000000.0 / CAST(nte AS DOUBLE), 6)
      |    AS brier,
      |  round(CAST(sum(rel9) AS DOUBLE) / 1000000000.0 / CAST(nte AS DOUBLE), 6)
      |    AS reliability,
      |  round(CAST(sum(res9) AS DOUBLE) / 1000000000.0 / CAST(nte AS DOUBLE), 6)
      |    AS resolution,
      |  round((CAST(ute AS DOUBLE) / CAST(nte AS DOUBLE))
      |    * (1.0 - CAST(ute AS DOUBLE) / CAST(nte AS DOUBLE)), 6)
      |    AS uncertainty
      |FROM q GROUP BY ntr, nte, nbins, ute""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(
      (col("o_orderkey") % 2 === 0).as("train"),
      expr("cast(round(o_totalprice * 100) as bigint) div 10000").as("vb"),
      (col("o_orderpriority") === "1-URGENT").cast("int").as("y"))
    val h = o.groupBy("vb").agg(
      sum(when(col("train"), 1L).otherwise(0L)).as("n_tr"),
      sum(when(col("train"), col("y")).otherwise(0)).as("u_tr"),
      sum(when(!col("train"), 1L).otherwise(0L)).as("n_te"),
      sum(when(!col("train"), col("y")).otherwise(0)).as("u_te"))
    // totals ride unbounded windows over the bounded bucket table — an
    // aggregate-and-join-back would re-derive the corpus histogram a
    // second time (plan-guarded single orders scan)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val hw = h
      .withColumn("ntr", sum("n_tr").over(wAll))
      .withColumn("nte", sum("n_te").over(wAll))
      .withColumn("ute", sum("u_te").over(wAll))
      .withColumn("nbins",
        sum(when(col("n_te") > 0, 1L).otherwise(0L)).over(wAll))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val terms = hw.filter(col("n_te") > 0)
      .select(col("n_te"), col("u_te"), col("ntr"), col("nte"), col("ute"),
        col("nbins"),
        (dbl(col("u_tr") + 1) / dbl(col("n_tr") + 2)).as("ph"),
        (dbl(col("u_te")) / dbl(col("n_te"))).as("yb"),
        (dbl(col("ute")) / dbl(col("nte"))).as("ybar"))
    val q = terms.select(col("ntr"), col("nte"), col("ute"), col("nbins"),
      round(lit(1000000000.0) * (dbl(col("u_te")) * (lit(1.0) - col("ph"))
        * (lit(1.0) - col("ph"))
        + dbl(col("n_te") - col("u_te")) * col("ph") * col("ph")))
        .cast("bigint").as("br9"),
      round(lit(1000000000.0) * dbl(col("n_te"))
        * (col("ph") - col("yb")) * (col("ph") - col("yb")))
        .cast("bigint").as("rel9"),
      round(lit(1000000000.0) * dbl(col("n_te"))
        * (col("yb") - col("ybar")) * (col("yb") - col("ybar")))
        .cast("bigint").as("res9"))
    q.groupBy("ntr", "nte", "ute", "nbins")
      .agg(sum("br9").as("sbr"), sum("rel9").as("srel"), sum("res9").as("sres"))
      .select(col("ntr").as("n_train"), col("nte").as("n_test"),
        col("nbins").as("n_bins"),
        round(dbl(col("sbr")) / 1000000000.0 / dbl(col("nte")), 6).as("brier"),
        round(dbl(col("srel")) / 1000000000.0 / dbl(col("nte")), 6)
          .as("reliability"),
        round(dbl(col("sres")) / 1000000000.0 / dbl(col("nte")), 6)
          .as("resolution"),
        round((dbl(col("ute")) / dbl(col("nte")))
          * (lit(1.0) - dbl(col("ute")) / dbl(col("nte"))), 6)
          .as("uncertainty"))
  }

  // q224 — K-fold out-of-fold target mean encoding of customer nation
  // against order value (the leakage-safe categorical encoder every
  // tabular training pipeline ships: encoding a category with ITS OWN
  // rows' target leaks the label, so fold f's encoding must see every
  // fold EXCEPT f — and at 100 TB you cannot afford K passes, so the
  // whole computation is ONE (category × fold) aggregate and O(|cats|·K)
  // algebra: oof sums are total-minus-own-fold differences of exact
  // cents integers, never a second scan). Smoothing shrinks thin cells
  // toward the fold's own leave-fold-out GLOBAL prior (m=100, the
  // standard m-estimate); prior and encoding are single
  // identical-operand-order divisions of exact ints rounded once.
  // Folds by orderkey modulus (the q23/q202/q223 deterministic-split
  // convention); the nation dim broadcasts onto the fact scan.
  val q224: QueryDef = QueryDef.sql(
    "q224_target_encoding",
    """WITH o AS (
      |  SELECT c.c_nationkey AS nation, o.o_orderkey % 5 AS fold,
      |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |nf AS (
      |  SELECT nation, fold, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cents) AS BIGINT) AS sc
      |  FROM o GROUP BY 1, 2),
      |w AS (
      |  SELECT nation, fold, n, sc,
      |    sum(n) OVER (PARTITION BY nation) AS n_nat,
      |    sum(sc) OVER (PARTITION BY nation) AS s_nat,
      |    sum(n) OVER (PARTITION BY fold) AS n_fold,
      |    sum(sc) OVER (PARTITION BY fold) AS s_fold,
      |    sum(n) OVER () AS n_all,
      |    sum(sc) OVER () AS s_all
      |  FROM nf)
      |SELECT nation, fold, CAST(n_nat - n AS BIGINT) AS n_oof,
      |  round(CAST(s_all - s_fold AS DOUBLE)
      |    / CAST(n_all - n_fold AS DOUBLE) / 100.0, 6) AS prior,
      |  round((CAST(s_nat - sc AS DOUBLE) / 100.0
      |      + 100.0 * (CAST(s_all - s_fold AS DOUBLE)
      |        / CAST(n_all - n_fold AS DOUBLE) / 100.0))
      |    / (CAST(n_nat - n AS DOUBLE) + 100.0), 6) AS encoding
      |FROM w ORDER BY nation, fold""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey").as("nation"),
        (col("o_orderkey") % 5).as("fold"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val nf = o.groupBy("nation", "fold")
      .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
    val w = nf
      .withColumn("n_nat", sum("n").over(Window.partitionBy("nation")))
      .withColumn("s_nat", sum("sc").over(Window.partitionBy("nation")))
      .withColumn("n_fold", sum("n").over(Window.partitionBy("fold")))
      .withColumn("s_fold", sum("sc").over(Window.partitionBy("fold")))
      .withColumn("n_all", sum("n").over(Window.partitionBy()))
      .withColumn("s_all", sum("sc").over(Window.partitionBy()))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val prior = dbl(col("s_all") - col("s_fold")) /
      dbl(col("n_all") - col("n_fold")) / 100.0
    w.select(col("nation"), col("fold"),
        (col("n_nat") - col("n")).as("n_oof"),
        round(prior, 6).as("prior"),
        round((dbl(col("s_nat") - col("sc")) / 100.0 + lit(100.0) * prior)
          / (dbl(col("n_nat") - col("n")) + 100.0), 6).as("encoding"))
      .orderBy("nation", "fold")
  }

  // q227 — decision-stump best split by Gini gain (the CART split
  // primitive every tree/GBM trainer runs millions of times — one
  // feature, one pass, the exact threshold search that is O(n log n)
  // per node in a naive engine and O(buckets) here: q214 RANKS features
  // by MI, this finds the CUT): candidate thresholds are the 1000-cent
  // bucket boundaries (contract at bucket granularity); ONE corpus
  // aggregate to the bounded (bucket: n, urgent) table, left/right
  // class counts for EVERY threshold come from one cumulative window
  // over O(buckets) rows, and the Gini gain 2/N·[U(N−U)/N − uₗ(nₗ−uₗ)/nₗ
  // − uᵣ(nᵣ−uᵣ)/nᵣ] is a fixed-operand-order expression of exact
  // integers QUANTIZED onto the 1e-12 grid — the argmax is then an
  // integer decision with a bucket tiebreak, engine-identical even at
  // exact gain ties (q222's boundary-exactness discipline applied to a
  // search). Degenerate thresholds (empty side) are excluded; output is
  // the winning boundary with both side's counts and rates.
  val q227: QueryDef = QueryDef.sql(
    "q227_gini_best_split",
    """WITH o AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 1000 AS vb,
      |    CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y
      |  FROM orders),
      |h AS (
      |  SELECT vb, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS u
      |  FROM o GROUP BY vb),
      |c AS (
      |  SELECT vb,
      |    sum(n) OVER (ORDER BY vb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
      |    sum(u) OVER (ORDER BY vb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ul,
      |    sum(n) OVER () AS nn, sum(u) OVER () AS uu
      |  FROM h),
      |g AS (
      |  SELECT vb, nl, ul, nn - nl AS nr, uu - ul AS ur, nn, uu,
      |    CAST(round(1000000000000.0 * 2.0
      |      * (CAST(uu AS DOUBLE) * CAST(nn - uu AS DOUBLE) / CAST(nn AS DOUBLE)
      |        - CAST(ul AS DOUBLE) * CAST(nl - ul AS DOUBLE) / CAST(nl AS DOUBLE)
      |        - CAST(uu - ul AS DOUBLE) * CAST((nn - nl) - (uu - ul) AS DOUBLE)
      |          / CAST(nn - nl AS DOUBLE))
      |      / CAST(nn AS DOUBLE)) AS BIGINT) AS g12
      |  FROM c WHERE nl > 0 AND nl < nn)
      |SELECT vb * 1000 + 999 AS split_cents,
      |  CAST(nl AS BIGINT) AS n_left, CAST(ul AS BIGINT) AS u_left,
      |  CAST(nr AS BIGINT) AS n_right, CAST(ur AS BIGINT) AS u_right,
      |  round(CAST(g12 AS DOUBLE) / 1000000000000.0, 9) AS gini_gain,
      |  round(CAST(ul AS DOUBLE) / CAST(nl AS DOUBLE), 6) AS rate_left,
      |  round(CAST(ur AS DOUBLE) / CAST(nr AS DOUBLE), 6) AS rate_right
      |FROM g ORDER BY g12 DESC, vb LIMIT 1""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(
      expr("cast(round(o_totalprice * 100) as bigint) div 1000").as("vb"),
      (col("o_orderpriority") === "1-URGENT").cast("bigint").as("y"))
    val h = o.groupBy("vb").agg(count(lit(1)).as("n"), sum("y").as("u"))
    val wc = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, 0)
    val c = h
      .withColumn("nl", sum("n").over(wc))
      .withColumn("ul", sum("u").over(wc))
      .withColumn("nn", sum("n").over(Window.partitionBy()))
      .withColumn("uu", sum("u").over(Window.partitionBy()))
    def dbl(x: org.apache.spark.sql.Column) = x.cast("double")
    val g = c.filter(col("nl") > 0 && col("nl") < col("nn"))
      .select(col("vb"), col("nl"), col("ul"),
        (col("nn") - col("nl")).as("nr"), (col("uu") - col("ul")).as("ur"),
        col("nn"), col("uu"),
        round(lit(1000000000000.0) * lit(2.0)
          * (dbl(col("uu")) * dbl(col("nn") - col("uu")) / dbl(col("nn"))
            - dbl(col("ul")) * dbl(col("nl") - col("ul")) / dbl(col("nl"))
            - dbl(col("uu") - col("ul"))
              * dbl((col("nn") - col("nl")) - (col("uu") - col("ul")))
              / dbl(col("nn") - col("nl")))
          / dbl(col("nn"))).cast("bigint").as("g12"))
    g.orderBy(col("g12").desc, col("vb")).limit(1)
      .select((col("vb") * 1000 + 999).as("split_cents"),
        col("nl").as("n_left"), col("ul").as("u_left"),
        col("nr").as("n_right"), col("ur").as("u_right"),
        round(dbl(col("g12")) / 1000000000000.0, 9).as("gini_gain"),
        round(dbl(col("ul")) / dbl(col("nl")), 6).as("rate_left"),
        round(dbl(col("ur")) / dbl(col("nr")), 6).as("rate_right"))
  }

  // q232 — cumulative gains / lift deciles for q223's leakage-safe binned
  // scorer (the TARGETING readout the scoring family lacked: q180's AUC
  // is one number, q223's Brier audits probability truth, but the
  // question a campaign/triage team asks is "if I act on the top 10/20/…%
  // by score, what fraction of positives do I capture, and at what lift
  // over random?" — the gains table IS that answer). Same deterministic
  // construction as q223: train/test by orderkey parity, scorer =
  // train-side Laplace urgent rate per 10000-cent bucket (exact-int
  // division — identical doubles both engines), evaluated held-out.
  // Scale shape: ONE corpus aggregate to the bounded (bucket × split)
  // table; test buckets sort by (score desc, vb asc — double order is
  // engine-safe on identical values), cumulative counts ride one window
  // over the bounded table, and each bucket row EMITS the deciles it
  // closes — decile d belongs to the first bucket with 10·cum_n ≥ d·N
  // (the integer-ceil rank rule, q225's discipline; capture is reported
  // at bucket granularity, the stated contract), so bucket i with
  // previous cumulative p and cumulative c owns exactly d ∈
  // (10p/N, 10c/N], i.e. sequence(10p div N + 1, 10c div N) — a bounded
  // explode, never a join back onto the cumulative table (a grid join
  // would recompute the corpus scan chain a second time; plan-guarded
  // single scan). capture/frac/lift are single identical-operand-order
  // expressions of exact integers, rounded once.
  val q232: QueryDef = QueryDef.sql(
    "q232_gains_deciles",
    """WITH o AS (
      |  SELECT o_orderkey % 2 = 0 AS train,
      |    CAST(round(o_totalprice * 100) AS BIGINT) // 10000 AS vb,
      |    CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS y
      |  FROM orders),
      |h AS (
      |  SELECT vb,
      |    CAST(count(CASE WHEN train THEN 1 END) AS BIGINT) AS n_tr,
      |    CAST(sum(CASE WHEN train THEN y ELSE 0 END) AS BIGINT) AS u_tr,
      |    CAST(count(CASE WHEN NOT train THEN 1 END) AS BIGINT) AS n_te,
      |    CAST(sum(CASE WHEN NOT train THEN y ELSE 0 END) AS BIGINT) AS u_te
      |  FROM o GROUP BY vb),
      |t AS (
      |  SELECT vb, n_te, u_te,
      |    CAST(u_tr + 1 AS DOUBLE) / CAST(n_tr + 2 AS DOUBLE) AS ph
      |  FROM h WHERE n_te > 0),
      |c AS (
      |  SELECT t.*,
      |    CAST(sum(n_te) OVER (ORDER BY ph DESC, vb
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
      |    CAST(sum(u_te) OVER (ORDER BY ph DESC, vb
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cu,
      |    CAST(sum(n_te) OVER () AS BIGINT) AS nn,
      |    CAST(sum(u_te) OVER () AS BIGINT) AS uu
      |  FROM t),
      |sel AS (
      |  SELECT unnest(generate_series(10 * (cn - n_te) // nn + 1,
      |      (10 * cn) // nn)) AS decile,
      |    cn, cu, nn, uu
      |  FROM c WHERE (10 * cn) // nn >= 10 * (cn - n_te) // nn + 1)
      |SELECT CAST(decile AS BIGINT) AS decile, cn AS n_cum, cu AS u_cum,
      |  round(CAST(cu AS DOUBLE) / uu, 6) AS capture,
      |  round(CAST(cn AS DOUBLE) / nn, 6) AS frac_acted,
      |  round(CAST(cu AS DOUBLE) * nn
      |    / (CAST(uu AS DOUBLE) * cn), 6) AS lift
      |FROM sel
      |ORDER BY decile""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(
      (col("o_orderkey") % 2 === 0).as("train"),
      expr("cast(round(o_totalprice * 100) as bigint) div 10000").as("vb"),
      (col("o_orderpriority") === "1-URGENT").cast("int").as("y"))
    val h = o.groupBy("vb").agg(
      sum(when(col("train"), 1L).otherwise(0L)).as("n_tr"),
      sum(when(col("train"), col("y")).otherwise(0)).as("u_tr"),
      sum(when(!col("train"), 1L).otherwise(0L)).as("n_te"),
      sum(when(!col("train"), col("y")).otherwise(0)).as("u_te"))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val t = h.filter(col("n_te") > 0).select(col("vb"), col("n_te"),
      col("u_te"),
      (dbl(col("u_tr") + 1) / dbl(col("n_tr") + 2)).as("ph"))
    val wCum = Window.orderBy(col("ph").desc, col("vb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val c = t
      .withColumn("cn", sum("n_te").over(wCum))
      .withColumn("cu", sum("u_te").over(wCum))
      .withColumn("nn", sum("n_te").over(wAll))
      .withColumn("uu", sum("u_te").over(wAll))
    // each bucket emits the deciles it closes — a bounded explode, never
    // a grid join back onto c (which would recompute the corpus scan)
    c.withColumn("dlo", expr("(10 * (cn - n_te)) div nn + 1"))
      .withColumn("dhi", expr("(10 * cn) div nn"))
      .filter(col("dhi") >= col("dlo"))
      .select(explode(expr("sequence(dlo, dhi)")).as("decile"),
        col("cn").as("n_cum"), col("cu").as("u_cum"),
        round(dbl(col("cu")) / dbl(col("uu")), 6).as("capture"),
        round(dbl(col("cn")) / dbl(col("nn")), 6).as("frac_acted"),
        round(dbl(col("cu")) * dbl(col("nn"))
          / (dbl(col("uu")) * dbl(col("cn"))), 6).as("lift"))
      .orderBy("decile")
  }

  // q238 — isotonic calibration (pool-adjacent-violators) of the urgent
  // rate against the price-bucket order (the NONPARAMETRIC calibrator
  // next to q223's audit and q232's gains table: Platt-style parametric
  // maps assume a sigmoid; PAV fits the L2-OPTIMAL monotone map with no
  // shape assumption, and is what production score-calibration ships
  // when the reliability diagram bends). Train side only (orderkey
  // parity — q223's leakage-safe convention). Scale shape: ONE corpus
  // aggregate to the bounded (bucket: n, urgent) table, LOCALIZED under
  // q213's persist→take discipline (capped) — the PAV pass itself is
  // inherently sequential but runs over O(buckets) rows of driver-local
  // algebra in exact integers (block rates compared as cross-multiplied
  // int64 — u_i·n_j vs u_j·n_i, no doubles in any pooling decision), so
  // the fit is bit-deterministic at any corpus size. Output: the fitted
  // monotone step function as (block, vb_from, vb_to, n, u, rate) rows.
  // Sequential driver pass → rows-only; the spec replays PAV densely and
  // pins monotonicity, mass conservation, and the PAV optimality
  // structure (adjacent block rates strictly increasing).
  val q238: QueryDef = QueryDef.rowsOnly("q238_isotonic_calibration") { (s, d) =>
    val hBig = Tables.orders(s, d)
      .filter(col("o_orderkey") % 2 === 0)
      .groupBy(expr("cast(round(o_totalprice * 100) as bigint) div 10000")
        .as("vb"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_orderpriority") === "1-URGENT").cast("long")).as("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hRows = hBig.take(1 << 20)
    require(hRows.length < (1 << 20), "bucket-table driver overflow")
    hBig.unpersist(false)
    val buckets = hRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // PAV with exact-integer rate comparisons: pool while the previous
    // block's rate is >= the new block's (u_prev·n_new >= u_new·n_prev)
    final case class Block(vbFrom: Long, vbTo: Long, n: Long, u: Long)
    val stack = scala.collection.mutable.ArrayBuffer[Block]()
    buckets.foreach { case (vb, n, u) =>
      var b = Block(vb, vb, n, u)
      // BigInt cross-multiply: pooled blocks' (u, n) each approach the
      // train-side corpus size, so the int64 product would overflow past
      // N ≈ 3e9 rows; the comparison is driver-local O(buckets), so the
      // exact wide multiply costs nothing and keeps the decision
      // bit-deterministic at ANY corpus size.
      while (stack.nonEmpty &&
        BigInt(stack.last.u) * b.n >= BigInt(b.u) * stack.last.n) {
        val p = stack.remove(stack.length - 1)
        b = Block(p.vbFrom, b.vbTo, p.n + b.n, p.u + b.u)
      }
      stack += b
    }
    import s.implicits._
    stack.toSeq.zipWithIndex.map { case (b, i) =>
      (i.toLong, b.vbFrom, b.vbTo, b.n, b.u, b.u.toDouble / b.n)
    }.toDF("block", "vb_from", "vb_to", "n_orders", "n_urgent", "rate_fitted")
  }

  val all: Seq[QueryDef] = Seq(q20, q21, q22, q23, q24, q25, q26, q27, q32,
    q39, q121, q155, q162, q199, q214, q223, q224, q227, q232, q238)
}
