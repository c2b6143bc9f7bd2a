package graft.dedup

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorExprs

/** Deduplication operators for LLM training-data pipelines.
  *
  * The scale posture: exact dedup is a hash groupBy (one shuffle on the
  * content hash); near-dup never materializes the O(n²) pair space — pairs
  * are generated only inside bounded candidate buckets (shared source /
  * MinHash LSH bands / SimHash bands), each a shuffle key.
  */
object Dedup {

  // q40 — exact dedup via content hash: keep-first per hash group.
  val q40: QueryDef = QueryDef.sql(
    "q40_dedup_exact",
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY h""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")
  }

  // q41 — n-gram Jaccard near-dup: candidate pairs share a `source` bucket
  // (bounded bucket size → bounded pair fan-out), similarity = Jaccard of
  // distinct char-3-gram sets. Top-50 most similar pairs.
  val q41: QueryDef = QueryDef.sql(
    "q41_dedup_ngram_jaccard",
    """WITH g AS (
      |  SELECT doc_id, source, length(text) // 200 AS len_bucket,
      |    list_distinct(list_transform(range(1, length(text) - 1),
      |      i -> substr(text, CAST(i AS INT), 3))) AS grams
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
      |FROM g a JOIN g b ON a.source = b.source
      |  AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
      |ORDER BY jaccard DESC, id_a, id_b
      |LIMIT 50""".stripMargin) { (s, d) =>
    // Candidate blocking: same source AND same length band (near-dups have
    // near-equal lengths) — bounds the pair fan-out; similarity itself is
    // the native set-based JaccardSim expression (one fused loop per pair).
    // The gram projection feeds both sides of the self-join — materialize
    // it once (at cluster scale: a persisted signature table, the standard
    // shape for LSH/near-dup pipelines) instead of recomputing per side.
    val g = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        floor(length(col("text")) / 200).as("len_bucket"),
        sort_array(array_distinct(VectorExprs.charNgrams(col("text"), 3))).as("grams"))
      .cache()
    val a = g.select(col("doc_id").as("id_a"), col("source").as("src_a"),
      col("len_bucket").as("lb_a"), col("grams").as("grams_a"))
    val b = g.select(col("doc_id").as("id_b"), col("source").as("src_b"),
      col("len_bucket").as("lb_b"), col("grams").as("grams_b"))
    a.join(b, col("src_a") === col("src_b") && col("lb_a") === col("lb_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorExprs.jaccardSimSorted(col("grams_a"), col("grams_b")).as("jaccard"))
      .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
      .limit(50)
  }

  /** 16 MinHash permutations ((a·h + b) mod p over FNV shingle hashes),
    * banded 2×8 for LSH bucketing — the (1/b)^(1/r) ≈ 0.92 similarity
    * threshold regime standard for LLM near-dup dedup, which also keeps
    * band-bucket collisions (and the candidate-pair fan-out) tight.
    */
  private val MinhashPerms = 16
  private val BandSize = 8

  // q42 — MinHash + LSH candidate pairs (xxhash64 is Spark-specific →
  // rows-only). Bands are the shuffle key; pairs form only inside a band
  // bucket.
  val q42: QueryDef = QueryDef.rowsOnly("q42_dedup_minhash_lsh") { (s, d) =>
    val sig = Tables.documents(s, d)
      .select(col("doc_id"),
        VectorExprs.minHashSig(col("text"), k = 5, nPerm = MinhashPerms).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(expr((0 until MinhashPerms / BandSize).map(bnd =>
        s"named_struct('band', $bnd, 'key', xxhash64(concat_ws(',', slice(sig, ${bnd * BandSize + 1}, $BandSize))))")
        .mkString("array(", ", ", ")"))).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band").as("band_a"), col("key").as("key_a"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band").as("band_b"), col("key").as("key_b"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, col("band_a") === col("band_b") && col("key_a") === col("key_b") &&
        col("id_a") < col("id_b"))
      .withColumn("est_jaccard",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))").cast("double")
          / MinhashPerms)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_bands"), first("est_jaccard").as("est_jaccard"))
      .orderBy(desc("est_jaccard"), asc("id_a"), asc("id_b"))
      .limit(1000) // top near-dup candidates (bounded output, TakeOrdered)
  }

  // q43 — 64-bit SimHash near-dup: per-bit weighted token-hash vote, then
  // 4×16-bit band blocking for hamming-distance candidates (rows-only:
  // xxhash64).
  val q43: QueryDef = QueryDef.rowsOnly("q43_dedup_simhash") { (s, d) =>
    val sh = Tables.documents(s, d)
      .select(col("doc_id"),
        VectorExprs.simHash64(array_distinct(split(trim(col("text")), "\\s+"))).as("simhash"))
    val banded = sh.select(col("doc_id"), col("simhash"), explode(expr(
      "transform(sequence(0, 3), b -> named_struct('band', b, 'key', shiftright(simhash, b * 16) & 65535))")).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band").as("band_a"), col("key").as("key_a"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band").as("band_b"), col("key").as("key_b"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("band_a") === col("band_b") && col("key_a") === col("key_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
      .orderBy(asc("hamming"), asc("id_a"), asc("id_b"))
      .limit(1000) // top near-dup candidates (bounded output, TakeOrdered)
  }

  // q44 — embedding-cosine near-dup pairs: exact threshold join (the
  // correctness baseline; the LSH-bucketed scale path is q51/q53). Cosine
  // rounded to 8 — list-sum association order is engine-internal.
  val q44: QueryDef = QueryDef.sql(
    "q44_dedup_embedding",
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_sum(list_transform(range(1, 65),
      |      i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
      |    / (a.nrm * b.nrm), 8) AS cos_sim
      |FROM v a JOIN v b ON a.vec_id < b.vec_id
      |ORDER BY cos_sim DESC, id_a, id_b
      |LIMIT 50""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val a = v.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = v.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorExprs.cosineSim(col("emb_a"), col("emb_b")), 8).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("id_a"), asc("id_b"))
      .limit(50)
  }

  /** Connected components by iterative min-label propagation over an edge
    * list — the cluster step that turns near-dup PAIRS into dedup GROUPS
    * (keep one doc per component). Each iteration is one join + aggregate
    * (AQE-planned); iterations are bounded by component diameter, which is
    * tiny for near-dup clusters. No driver-side graph state.
    */
  def connectedComponents(pairs: org.apache.spark.sql.DataFrame,
      maxIters: Int = 10): org.apache.spark.sql.DataFrame = {
    // undirected edges both ways
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src").withColumnRenamed("label", "src_label"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("src_label").as("nbr_label"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old_label"), "id")
        .filter(col("label") =!= col("old_label")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  // q45 — near-dup clusters: MinHash candidate pairs → connected
  // components → per-cluster keep-first (the end-to-end LLM dedup
  // pipeline: signature → candidates → clusters → keep list).
  val q45: QueryDef = QueryDef.rowsOnly("q45_dedup_clusters") { (s, d) =>
    val pairs = q42.fn(s, d).select("id_a", "id_b")
    val labels = connectedComponents(pairs)
    labels
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), min("id").as("keep_id"))
      .orderBy("cluster_id")
  }

  val all: Seq[QueryDef] = Seq(q40, q41, q42, q43, q44, q45)
}
