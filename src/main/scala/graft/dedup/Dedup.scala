package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // q41 — n-gram Jaccard near-dup, LSH-blocked: candidate pairs come from
  // MinHash band collisions (bounded band buckets — the same signature
  // machinery as q42), then the exact Jaccard of distinct char-3-gram sets
  // reranks ONLY the candidates. Top-50 most similar pairs. Only (band,
  // key, doc_id) flows through the candidate shuffle — the gram arrays
  // join in afterwards keyed by doc_id, so the heavy payload never rides
  // the pair-generating self-join, and pair fan-out is O(Σ bucket²) over
  // LSH buckets whose population does NOT grow with corpus size (only
  // near-identical signatures share a bucket), unlike source/length
  // blocking where blocks grow linearly with the corpus.
  val q41: QueryDef = QueryDef.sql(
    "q41_dedup_ngram_jaccard",
    s"""WITH $minhashBandedDuck,
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INT), 3))) AS grams
      |  FROM documents)
      |SELECT c.id_a, c.id_b,
      |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
      |FROM cand c JOIN g a ON c.id_a = a.doc_id JOIN g b ON c.id_b = b.doc_id
      |ORDER BY jaccard DESC, id_a, id_b
      |LIMIT 50""".stripMargin) { (s, d) =>
    candidatePairJaccard(s, d)
      .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
      .limit(50)
  }

  /** Every LSH candidate pair with its EXACT char-3-gram Jaccard —
    * q41's rerank table, shared with q138's threshold sweep. LSH
    * candidates: the band value is the shuffle key; a pair collides in
    * ≤2 bands so the distinct is cheap, and no gram/sig payload rides
    * the pair-generating self-join — ids only; the (small) candidate set
    * joins back to per-doc gram sets keyed by doc_id and similarity is
    * the native set-based JaccardSim expression (one fused loop per
    * pair).
    */
  /** LSH candidate id pairs (id_a < id_b, deduped): ids only ride the
    * band self-join — the shared funnel head of q41/q109/q154.
    */
  private def candidateIdPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val banded = bandedCached(s, d).select("doc_id", "band", "key")
    banded.select(col("band"), col("key"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("key"), col("doc_id").as("id_b")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Per-doc sorted distinct char-3-gram sets (the rerank payload). */
  private def gramSets(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      sort_array(array_distinct(VectorExprs.charNgrams(col("text"), 3))).as("grams"))

  private def candidatePairJaccard(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val g = gramSets(s, d)
    candidateIdPairs(s, d)
      .join(g.select(col("doc_id").as("id_a"), col("grams").as("grams_a")), "id_a")
      .join(g.select(col("doc_id").as("id_b"), col("grams").as("grams_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorExprs.jaccardSimSorted(col("grams_a"), col("grams_b")).as("jaccard"))
  }

  // q154 — DIRECTIONAL shingle containment over the LSH candidate funnel:
  // Jaccard (q41) misses the doc-INSIDE-doc case — a short document fully
  // quoted by a long one scores |A|/|B| ≈ 0 on Jaccard but 1.0 on
  // containment |A∩B|/|A|, and that asymmetry (quotation, boilerplate
  // wrapping, partial syndication) is exactly what a curation pass needs
  // to see. Same scale posture as q41: ids-only band self-join generates
  // candidates, gram sets join in by doc_id, and the exact intersection
  // COUNT is one fused two-pointer InterCount pass per pair (integer out,
  // so both containments are single IEEE divisions — engine-identical
  // unrounded, no rounding needed anywhere).
  val q154: QueryDef = QueryDef.sql(
    "q154_shingle_containment",
    s"""WITH $minhashBandedDuck,
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INT), 3))) AS grams
      |  FROM documents)
      |SELECT id_a, id_b, inter, n_a, n_b,
      |  CAST(inter AS DOUBLE) / n_a AS cont_a,
      |  CAST(inter AS DOUBLE) / n_b AS cont_b
      |FROM (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS inter,
      |    CAST(len(a.grams) AS BIGINT) AS n_a,
      |    CAST(len(b.grams) AS BIGINT) AS n_b
      |  FROM cand c JOIN g a ON c.id_a = a.doc_id JOIN g b ON c.id_b = b.doc_id) t
      |ORDER BY greatest(CAST(inter AS DOUBLE) / n_a, CAST(inter AS DOUBLE) / n_b) DESC,
      |  id_a, id_b
      |LIMIT 50""".stripMargin) { (s, d) =>
    val g = gramSets(s, d)
    candidateIdPairs(s, d)
      .join(g.select(col("doc_id").as("id_a"), col("grams").as("grams_a")), "id_a")
      .join(g.select(col("doc_id").as("id_b"), col("grams").as("grams_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        VectorExprs.interCountSorted(col("grams_a"), col("grams_b"))
          .cast("long").as("inter"),
        size(col("grams_a")).cast("long").as("n_a"),
        size(col("grams_b")).cast("long").as("n_b"))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"),
        (col("inter").cast("double") / col("n_a")).as("cont_a"),
        (col("inter").cast("double") / col("n_b")).as("cont_b"),
        greatest(col("inter").cast("double") / col("n_a"),
          col("inter").cast("double") / col("n_b")).as("gmax"))
      .orderBy(desc("gmax"), asc("id_a"), asc("id_b"))
      .limit(50)
      .drop("gmax")
  }

  /** 16 MinHash permutations ((a·h + b) mod p over polynomial shingle
    * hashes), banded 2×8 for LSH bucketing — the (1/b)^(1/r) ≈ 0.92
    * similarity threshold regime standard for LLM near-dup dedup, which
    * also keeps band-bucket collisions (and the candidate-pair fan-out)
    * tight.
    */
  private val MinhashPerms = 16
  private val BandSize = 8

  /** DuckDB replay of [[graft.functions.MinHashSig]] up to the banded
    * signatures — shingle hashes per doc, the 16 affine-permutation
    * minima, then the 2×8 band keys. Shared by every oracle that blocks
    * on MinHash bands (q41 rerank, q42 candidates, q45/q46 clusters).
    */
  private lazy val minhashBandedDuck =
    """shs AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(length(text) - 3, 1)),
      |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(range(0, 5),
      |               c -> CAST(unicode(substr(text, CAST(i + c AS INT), 1)) AS BIGINT))),
      |           (a, b) -> (a * 131 + b) % 1000000007)) AS sh
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 16),
      |      j -> coalesce(list_min(list_transform(sh,
      |             h -> ((1103515245 + 12345 * j) * h + 1013904223 + 7 * j) % 2147483647)), 0)) AS sig
      |  FROM shs),
      |banded AS (
      |  SELECT doc_id, sig, t.band AS band,
      |    array_to_string(list_slice(sig, CAST(t.band * 8 + 1 AS INT), CAST(t.band * 8 + 8 AS INT)), ',') AS key
      |  FROM sig, (SELECT unnest(range(0, 2)) AS band) t)""".stripMargin

  /** [[minhashBandedDuck]] plus the bounded top-1000 candidate-pair CTE —
    * the full q42 replay, shared by the q42 and q45/q46 oracles.
    */
  private lazy val minhashSigDuck =
    s"""$minhashBandedDuck,
      |cpairs AS (
      |  SELECT id_a, id_b, count(*) AS n_bands, max(est_jaccard) AS est_jaccard
      |  FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |      CAST(len(list_filter(range(1, 17),
      |        i -> a.sig[CAST(i AS INT)] = b.sig[CAST(i AS INT)])) AS DOUBLE) / 16 AS est_jaccard
      |    FROM banded a JOIN banded b
      |      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id) p
      |  GROUP BY id_a, id_b
      |  ORDER BY est_jaccard DESC, id_a, id_b
      |  LIMIT 1000)""".stripMargin

  /** The full corpus' banded signatures, computed once per (session,
    * corpus) and CACHED: the signature hash is the dominant cost of the
    * MinHash family, and a self-join would otherwise evaluate it twice
    * (once per side — plan-verified, no subtree reuse). Consumers: q41's
    * candidates, q42's pairs, q45/q46 via the label memo. The in-memory
    * analogue of the persisted signature table (writeSignatureTable).
    */
  private val bandedMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()
  graft.Memos.register { () => bandedMemo.values.forEach(_.unpersist()); bandedMemo.clear() }
  private def bandedCached(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    bandedMemo.computeIfAbsent((s, d), { _ =>
      bandedSignatures(Tables.documents(s, d)).cache()
    })

  /** Banded MinHash signatures (doc_id, sig, band, key) — the persisted
    * "signature table" of a production dedup pipeline: computed once per
    * corpus snapshot, joined many times.
    */
  private[graft] def bandedSignatures(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sig = docs.select(col("doc_id"),
      VectorExprs.minHashSig(col("text"), k = 5, nPerm = MinhashPerms).as("sig"))
    sig.select(col("doc_id"), col("sig"),
      explode(expr((0 until MinhashPerms / BandSize).map(bnd =>
        s"named_struct('band', $bnd, 'key', array_join(transform(slice(sig, ${bnd * BandSize + 1}, $BandSize), x -> cast(x as string)), ','))")
        .mkString("array(", ", ", ")"))).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
  }

  /** Persist the banded signatures bucketed+sorted on a combined
    * `band:slice` key: every later candidate join (new-batch-vs-corpus or
    * corpus-vs-corpus) is an exchange-free SortMergeJoin over co-located
    * buckets — at 100 TB the difference between re-shuffling the corpus
    * per run and reading buckets in place. The bucket column must BE the
    * join key (Spark only engages bucketed scans when the join keys cover
    * the bucket spec), hence the single concatenated key.
    */
  def writeSignatureTable(s: org.apache.spark.sql.SparkSession, dir: String,
      table: String, buckets: Int): Unit =
    writeSignatureTableFor(Tables.documents(s, dir), table, buckets)

  /** [[writeSignatureTable]] over an arbitrary document set — the corpus
    * snapshot and each incremental batch get their own bucketed table
    * with the SAME bucket count, so batch-vs-corpus candidate joins stay
    * exchange-free.
    */
  def writeSignatureTableFor(docs: org.apache.spark.sql.DataFrame,
      table: String, buckets: Int): Unit =
    graft.operators.ScaleJoins.writeBucketed(
      bandedSignatures(docs)
        .select(col("doc_id"), concat_ws(":", col("band"), col("key")).as("bkey")),
      table, "bkey", buckets)

  /** Candidate pairs from two persisted signature tables (exchange-free
    * when both are bucketed on `bkey` with equal bucket counts).
    */
  def bucketedCandidates(s: org.apache.spark.sql.SparkSession,
      tableA: String, tableB: String): org.apache.spark.sql.DataFrame =
    s.table(tableA).as("a")
      .join(s.table(tableB).as("b"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))

  // q42 — MinHash + LSH candidate pairs. Bands are the shuffle key; pairs
  // form only inside a band bucket. The signature hash is engine-portable
  // (polynomial over code points — see MinHashSig) and the band key is the
  // band's value string, so DuckDB replays the whole pipeline exactly.
  val q42: QueryDef = QueryDef.sql(
    "q42_dedup_minhash_lsh",
    s"""WITH $minhashSigDuck
       |SELECT id_a, id_b, n_bands, est_jaccard FROM cpairs""".stripMargin) { (s, d) =>
    val banded = bandedCached(s, d)
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

  /** DuckDB replay of [[graft.functions.SimHash64]]: per-token the four
    * polynomial hashes, then per-band the 16 vote-packed bits. Band k of
    * the signature = Σ_j [Σ_tokens ±1 vote of bit j of h_k ≥ 0]·2^j.
    */
  private val simhashBandsDuck =
    """th AS (
      |  SELECT doc_id,
      |    list_transform(list_distinct(regexp_split_to_array(trim(text), '\s+')), tok -> [
      |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(tok) + 1),
      |        i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))), (a, b) -> (a * 131 + b) % 1000000007),
      |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(tok) + 1),
      |        i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))), (a, b) -> (a * 137 + b) % 998244353),
      |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(tok) + 1),
      |        i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))), (a, b) -> (a * 139 + b) % 1000000021),
      |      list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(tok) + 1),
      |        i -> CAST(unicode(substr(tok, CAST(i AS INT), 1)) AS BIGINT))), (a, b) -> (a * 149 + b) % 999999937)
      |    ]) AS th
      |  FROM documents),
      |bands AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 4), k ->
      |      list_sum(list_transform(range(0, 16), j ->
      |        CASE WHEN coalesce(list_sum(list_transform(th,
      |            t -> CASE WHEN (t[CAST(k + 1 AS INT)] // (CAST(1 AS BIGINT) << CAST(j AS INT))) % 2 = 1
      |                 THEN 1 ELSE -1 END)), 0) >= 0
      |          THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END))) AS bands
      |  FROM th),
      |banded AS (
      |  SELECT doc_id, bands, t.band AS band, bands[CAST(t.band + 1 AS INT)] AS key
      |  FROM bands, (SELECT unnest(range(0, 4)) AS band) t)""".stripMargin

  /** q43's banded SimHash rows, computed once per (session, corpus) and
    * CACHED — the pair self-join would otherwise run the 4 polynomial
    * token hashes on both sides (same rationale as [[bandedCached]]).
    */
  private val simhashMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()
  graft.Memos.register { () => simhashMemo.values.forEach(_.unpersist()); simhashMemo.clear() }
  private def simhashBandedCached(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    simhashMemo.computeIfAbsent((s, d), { _ =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          VectorExprs.simHash64(array_distinct(split(trim(col("text")), "\\s+"))).as("simhash"))
        .select(col("doc_id"), col("simhash"), explode(expr(
          "transform(sequence(0, 3), b -> named_struct('band', b, 'key', shiftright(simhash, b * 16) & 65535))")).as("bk"))
        .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
        .cache()
    })

  // q43 — 64-bit SimHash near-dup: per-bit weighted token-hash vote, then
  // 4×16-bit band blocking for hamming-distance candidates. Token hashes
  // are engine-portable polynomials (see SimHash64), so the DuckDB oracle
  // rebuilds the band values bit-by-bit and checks the full pipeline.
  val q43: QueryDef = QueryDef.sql(
    "q43_dedup_simhash",
    s"""WITH $simhashBandsDuck
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.bands[1], b.bands[1])) + bit_count(xor(a.bands[2], b.bands[2]))
       |    + bit_count(xor(a.bands[3], b.bands[3])) + bit_count(xor(a.bands[4], b.bands[4])) AS INTEGER) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY hamming, id_a, id_b
       |LIMIT 1000""".stripMargin) { (s, d) =>
    val banded = simhashBandedCached(s, d)
    val a = banded.select(col("band").as("band_a"), col("key").as("key_a"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band").as("band_b"), col("key").as("key_b"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("band_a") === col("band_b") && col("key_a") === col("key_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      // A pair collides in at most 4 bands, so the raw top-4×1000 rows
      // (TakeOrderedAndProject — partition heaps, no full shuffle)
      // contain every copy of the true top-1000 DISTINCT pairs; the
      // distinct then runs on 4000 rows instead of the multi-million
      // candidate fan-out. Output is provably identical to
      // distinct-then-top-1000.
      .orderBy(asc("hamming"), asc("id_a"), asc("id_b"))
      .limit(4000)
      .distinct()
      .orderBy(asc("hamming"), asc("id_a"), asc("id_b"))
      .limit(1000) // top near-dup candidates (bounded output)
  }

  /** q44's candidate blocking: a deterministic seed-vector IVF quantizer.
    * `nCells(n)` seed vectors (lowest vec_ids) define the cells; every
    * vector multi-assigns to its `MAssign` nearest cells by cosine, and
    * candidate pairs must share a cell. The cell count SCALES WITH THE
    * CORPUS — k = max(16, ⌈√n⌉) — so per-cell population grows like √n
    * and candidate volume is O(n^1.5·m²), not the O(n²) a fixed cell
    * count degrades to at 100× data (per-cell population would grow
    * linearly and pair fan-out quadratically). Seeds are deterministic
    * data rows (the k lowest vec_ids) so the DuckDB oracle replays the
    * EXACT blocked pipeline — the hash check covers the scale-safe plan
    * itself; sub-quadratic candidate growth across scale factors is
    * asserted in OperatorSemanticsSpec. Beyond seeds-from-data, the
    * trained `ml.Centroids` quantizer is the drop-in upgrade (same cell
    * interface) when replayability is not required.
    */
  private[graft] def nCells(s: org.apache.spark.sql.SparkSession, d: String): Int =
    math.max(16, math.ceil(math.sqrt(Tables.embeddingsCount(s, d).toDouble)).toInt)
  private val MAssign = 4

  /** DuckDB replay of [[seedVectors]]: the max(16, ⌈√n⌉) lowest-vec_id
    * rows with their norms — shared by the q44 and q58 oracles. The
    * window-function form (not LIMIT) keeps the seed count a pure SQL
    * expression of the corpus itself.
    */
  private[graft] lazy val seedsDuck: String =
    """seeds AS (
      |  SELECT vec_id AS cell, embedding AS semb,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS snrm
      |  FROM (SELECT vec_id, embedding,
      |          row_number() OVER (ORDER BY vec_id) AS srn,
      |          count(*) OVER () AS n
      |        FROM embeddings) seedsrc
      |  WHERE srn <= greatest(16, CAST(ceil(sqrt(n)) AS BIGINT)))""".stripMargin

  /** Per-vector top-`MAssign` seed-cell assignments
    * (vec_id, embedding, nrm, cell, crank, c) — the shared blocking
    * quantizer: one codegen'd projection against seed literals, no
    * window, no crossJoin. `crank` is the 1-based rank of the cell for
    * that vector and `c` the round-8 cosine, so top-1 consumers (q38's
    * outlier distance) read the cached rows instead of re-running the
    * k-seed projection. Used by q44's candidate blocking, q35's
    * approximate neighbor graph, and q38; consumers that only need
    * (vec_id, cell) rely on Catalyst column pruning to drop the carried
    * vector.
    */
  private val cellsMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()
  graft.Memos.register { () => cellsMemo.values.forEach(_.unpersist()); cellsMemo.clear() }

  /** [[seedCellAssignmentsUncached]] memoized and CACHED per (session,
    * corpus): q44 self-joins the assignments (both sides would re-score
    * every seed cosine per row) and q35's neighbor graph reuses them.
    */
  private[graft] def seedCellAssignments(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    cellsMemo.computeIfAbsent((s, d), { _ => seedCellAssignmentsUncached(s, d).cache() })

  /** The deterministic seed vectors (the `nCells(n)` lowest vec_ids) that
    * define the blocking quantizer's cells — O(√n·d) bounded driver rows,
    * like a centroid matrix (n=10⁹ → ~32k seeds × 64 d ≈ 16 MB). Shared
    * with q58's cell-balanced sampling.
    */
  private[graft] def seedVectors(s: org.apache.spark.sql.SparkSession,
      d: String): Array[(Long, Array[Double])] = {
    val k = nCells(s, d)
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(k).take(k)
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
  }

  /** round-8 cosine of the row's `embedding` against a seed vector, with
    * the row norm PRECOMPUTED in col("nrm") and the seed norm folded to a
    * driver constant: dot/(nrm·snrm) — bit-identical to CosineSim and
    * the oracle's nrm-product form (the r2-verified identity), but a
    * k-seed score array costs k dots + 1 norm per row instead of
    * k·(dot + 2 norms).
    */
  private[graft] def seedCosine(sv: Array[Double]): org.apache.spark.sql.Column = {
    var sn = 0.0
    var i = 0
    while (i < sv.length) { sn += sv(i) * sv(i); i += 1 }
    round(VectorExprs.dotProduct(col("embedding"), typedlit(sv))
      / (col("nrm") * lit(math.sqrt(sn))), 8)
  }

  /** [[seedCellAssignmentsUncached]] over an ARBITRARY (vec_id,
    * embedding) frame with a caller-supplied frozen seed set — the
    * incremental-maintenance entry point: a new batch must assign under
    * the SNAPSHOT's geometry, not re-derive seeds that would shift every
    * existing assignment.
    */
  private[graft] def seedCellAssignmentsFor(vecs: org.apache.spark.sql.DataFrame,
      seeds: Array[(Long, Array[Double])]): org.apache.spark.sql.DataFrame = {
    val v = vecs.select(col("vec_id"), col("embedding"),
      sqrt(VectorExprs.dotProduct(col("embedding"), col("embedding"))).as("nrm"))
    // per-row top-m cells in one codegen'd projection: sort (−cos, cell)
    // structs ascending, keep the first m
    val cellsCol = slice(array_sort(array(seeds.toIndexedSeq.map { case (cid, sv) =>
      struct((-seedCosine(sv)).as("negc"),
        lit(cid).as("cell"))
    }: _*)), 1, MAssign)
    v.select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(cellsCol).as(Seq("crank0", "sc")))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("sc.cell").as("cell"), (col("crank0") + 1).cast("int").as("crank"),
        (-col("sc.negc")).as("c"))
  }

  private def seedCellAssignmentsUncached(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    seedCellAssignmentsFor(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      seedVectors(s, d))

  /** The blocked candidate-pair set (id_a < id_b, distinct): pairs form
    * only inside a shared quantizer cell. With √n cells the candidate
    * volume grows as O(n^1.5·m²) — OperatorSemanticsSpec measures the
    * growth exponent across scale factors. Shared by q44's rerank and
    * the spec.
    */
  private[graft] def embeddingCandidatePairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val cells = seedCellAssignments(s, d).select("vec_id", "cell")
    cells.as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
  }

  // q44 — embedding-cosine near-dup pairs, IVF-cell blocked: per-vector
  // top-m cells come from ONE codegen'd projection against seed literals
  // (array_sort of (−cos, cell) structs — no window, no crossJoin), pairs
  // form only inside a cell (the shuffle key), then exact-cosine rerank +
  // global top-50 (TakeOrderedAndProject). The driver holds only the
  // O(cells·d) seed matrix — the bounded "centroids on the driver"
  // posture, never data-proportional rows. Recall vs the exact top-50 is
  // asserted in OperatorSemanticsSpec. Cosines rounded to 8 — sum
  // association order is engine-internal.
  val q44: QueryDef = QueryDef.sql(
    "q44_dedup_embedding",
    s"""WITH $seedsDuck,
      |v AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT v.vec_id, s.cell,
      |    round(list_sum(list_transform(range(1, 65),
      |        i -> CAST(v.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(s.semb[CAST(i AS INT)] AS DOUBLE)))
      |      / (v.nrm * s.snrm), 8) AS c
      |  FROM v, seeds s),
      |cells AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cell) AS rn
      |    FROM scored) t
      |  WHERE rn <= $MAssign),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id)
      |SELECT c.id_a, c.id_b,
      |  round(list_sum(list_transform(range(1, 65),
      |      i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
      |    / (a.nrm * b.nrm), 8) AS cos_sim
      |FROM cand c JOIN v a ON c.id_a = a.vec_id JOIN v b ON c.id_b = b.vec_id
      |ORDER BY cos_sim DESC, id_a, id_b
      |LIMIT 50""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val cand = embeddingCandidatePairs(s, d)
    // rerank with per-vector norms precomputed (dot + divide per pair;
    // bit-identical to CosineSim / the oracle's nrm-product form)
    val nrmCol = sqrt(VectorExprs.dotProduct(col("embedding"), col("embedding")))
    val va = v.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), nrmCol.as("nrm_a"))
    val vb = v.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), nrmCol.as("nrm_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(VectorExprs.dotProduct(col("emb_a"), col("emb_b"))
          / (col("nrm_a") * col("nrm_b")), 8).as("cos_sim"))
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
      maxIters: Int = 20): org.apache.spark.sql.DataFrame = {
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
      var next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // Truncate lineage periodically: without this the plan grows one
      // join+agg per iteration and deep clusters hit planner/stack limits
      // long before the data does.
      next = if ((iter + 1) % 5 == 0) next.localCheckpoint() else next.cache()
      // The convergence probe is a full job (join + limit-1 count), so
      // run it every 2nd iteration only — propagation past the fixpoint
      // is a no-op, and near-dup components have tiny diameters, so at
      // most one redundant iteration runs.
      if (iter % 2 == 1 || iter == maxIters - 1) {
        val changed = next.join(labels.withColumnRenamed("label", "old_label"), "id")
          .filter(col("label") =!= col("old_label")).limit(1).count()
        converged = changed == 0
      }
      labels.unpersist()
      labels = next
      iter += 1
    }
    labels
  }

  /** Near-dup cluster labels shared by q45 (cluster audit) and q46 (clean
    * corpus): ONE banded-signature pipeline + candidate join + label
    * propagation per (session, corpus), memoized — the two consumers used
    * to recompute the whole MinHash pipeline each.
    */
  private val labelsMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()
  graft.Memos.register { () => labelsMemo.values.forEach(_.unpersist()); labelsMemo.clear() }
  private def clusterLabels(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    labelsMemo.computeIfAbsent((s, d), { _ =>
      connectedComponents(q42.fn(s, d).select("id_a", "id_b"))
    })

  // q45 — near-dup clusters: MinHash candidate pairs → connected
  // components → per-cluster keep-first (the end-to-end LLM dedup
  // pipeline: signature → candidates → clusters → keep list). The DuckDB
  // oracle rebuilds q42's candidate pairs and takes the transitive
  // closure with a recursive CTE — label = min reachable id, the same
  // fixpoint the distributed min-label propagation converges to.
  val q45: QueryDef = QueryDef.sql(
    "q45_dedup_clusters",
    s"""WITH RECURSIVE $minhashSigDuck,
       |edges AS (
       |  SELECT id_a AS s, id_b AS t FROM cpairs
       |  UNION
       |  SELECT id_b AS s, id_a AS t FROM cpairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT e.s, rr.r FROM edges e JOIN reach rr ON rr.id = e.t),
       |labels AS (SELECT id, min(r) AS label FROM reach GROUP BY id)
       |SELECT label AS cluster_id, count(*) AS n_members, min(id) AS keep_id
       |FROM labels
       |GROUP BY label
       |ORDER BY cluster_id""".stripMargin) { (s, d) =>
    clusterLabels(s, d)
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"), min("id").as("keep_id"))
      .orderBy("cluster_id")
  }

  // q46 — the END of the dedup pipeline: the clean corpus. Drop list =
  // exact-dup non-keepers (content hash, keep-first) ∪ near-dup cluster
  // non-keepers (q45's components, keep-min); the clean set is one
  // anti-join against it. This is the query a training run actually
  // consumes — everything upstream (signatures, candidates, clusters)
  // exists to produce this keep-list.
  val q46: QueryDef = QueryDef.sql(
    "q46_clean_corpus",
    s"""WITH RECURSIVE $minhashSigDuck,
       |edges AS (
       |  SELECT id_a AS s, id_b AS t FROM cpairs
       |  UNION
       |  SELECT id_b AS s, id_a AS t FROM cpairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT e.s, rr.r FROM edges e JOIN reach rr ON rr.id = e.t),
       |labels AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
       |drop_near AS (
       |  SELECT l.id AS doc_id
       |  FROM labels l JOIN (SELECT label, min(id) AS keep FROM labels GROUP BY label) k
       |    ON l.label = k.label
       |  WHERE l.id != k.keep),
       |drop_exact AS (
       |  SELECT d.doc_id
       |  FROM documents d JOIN (SELECT md5(text) AS h, min(doc_id) AS keep
       |    FROM documents GROUP BY 1) e ON md5(d.text) = e.h
       |  WHERE d.doc_id != e.keep)
       |SELECT doc_id, lang FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop_near UNION SELECT doc_id FROM drop_exact)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val labels = clusterLabels(s, d)
    val keeps = labels.groupBy("label").agg(min("id").as("keep"))
    val dropNear = labels.join(keeps, "label")
      .filter(col("id") =!= col("keep")).select(col("id").as("doc_id"))
    val exact = docs.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keep"))
    val dropExact = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(exact, "h").filter(col("doc_id") =!= col("keep")).select("doc_id")
    docs.join(dropNear.unionByName(dropExact).distinct(), Seq("doc_id"), "left_anti")
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  // q47 — benchmark DECONTAMINATION: flag training documents that share
  // any long (20-char) n-gram with the held-out eval set (deterministic
  // eval membership: doc_id % 50 == 0 stands in for a benchmark table).
  // The eval gram set is tiny → broadcast; training grams stream through
  // the map-side join — no shuffle of the corpus. The standard
  // "13-gram overlap" contamination check at char granularity.
  val q47: QueryDef = QueryDef.sql(
    "q47_decontaminate",
    """WITH eg AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |    i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |  FROM documents WHERE doc_id % 50 = 0),
      |tg AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |    i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |  FROM documents WHERE doc_id % 50 != 0)
      |SELECT doc_id, count(*) AS n_shared
      |FROM tg JOIN eg USING (gram)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val evalGrams = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(array_distinct(VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .distinct()
    docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"),
        explode(array_distinct(VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  // q75 — decontamination BEHIND A BLOOM FILTER: q47's decision when the
  // eval-gram set is too large to broadcast as strings. The filter is
  // built DISTRIBUTED (Spark's BloomFilterAggregate — the same machinery
  // as its runtime join filters, which graft exposes on the SQL surface
  // as bloom_filter_agg/might_contain) and reaches the probe side as one
  // scalar-subquery binary of ~6 MB for 2M grams — vs gigabytes of
  // 20-char grams. The training side then never joins AT ALL: membership
  // is a map-side predicate, so the only shuffle left is the final
  // O(hits) groupBy(doc_id). Sized 24 bits/element so the PER-DOCUMENT
  // false-positive rate (each doc probes ~1k grams) stays ~1e-4; exact
  // q47 remains the precision rerank when needed. Bloom bit-ORs are
  // order-independent → deterministic at any parallelism, but the hash
  // layout is engine-specific → rows-only + the BloomDecontaminateSpec
  // no-false-negative/VS-exact gate.
  val q75: QueryDef = QueryDef.rowsOnly("q75_bloom_decontaminate") { (s, d) =>
    graft.plans.GraftExtensions.register(s)
    val v = s"docs_bloom_${graft.Memos.pathToken(d)}"
    Tables.documents(s, d).createOrReplaceTempView(v)
    s.sql(
      s"""WITH eg AS (
         |  SELECT explode(array_distinct(char_ngrams(text, 20))) AS gram
         |  FROM $v WHERE doc_id % 50 = 0),
         |bf AS (
         |  SELECT bloom_filter_agg(xxhash64(gram), 2000000L, 48000000L) AS b
         |  FROM eg),
         |tg AS (
         |  SELECT doc_id, explode(array_distinct(char_ngrams(text, 20))) AS gram
         |  FROM $v WHERE doc_id % 50 != 0)
         |SELECT doc_id, count(*) AS n_maybe
         |FROM tg
         |WHERE might_contain((SELECT b FROM bf), xxhash64(gram))
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin)
  }

  /** The eval-set gram Bloom filter as driver-held bytes, built once per
    * (session, corpus) by the same distributed aggregate as q75 — a
    * model-like artifact (O(filter bits), not O(corpus)) for paths that
    * need a FOLDABLE filter: [[contaminationFlags]] embeds it as a
    * binary literal so the probe stays a stateless per-row predicate,
    * which is what lets it run inside a streaming projection.
    */
  private val bloomMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), Array[Byte]]()
  graft.Memos.register { () => bloomMemo.clear() }
  private[graft] def evalGramBloom(s: org.apache.spark.sql.SparkSession,
      d: String): Array[Byte] =
    bloomMemo.computeIfAbsent((s, d), { _ =>
      graft.plans.GraftExtensions.register(s)
      Tables.documents(s, d).filter(col("doc_id") % 50 === 0)
        .select(explode(array_distinct(
          VectorExprs.charNgrams(col("text"), 20))).as("gram"))
        .agg(expr("bloom_filter_agg(xxhash64(gram), 2000000L, 48000000L)")
          .as("b"))
        .take(1)(0).getAs[Array[Byte]](0)
    })

  /** Per-doc contamination flags from a prebuilt Bloom filter: adds
    * `maybe_contaminated` = any 20-char gram might be in the eval set.
    * A pure projection (exists over the gram array, Bloom probe per
    * element) — no join, no shuffle, no state — so the same column works
    * on a STREAM of arriving documents (see StreamDedupSpec).
    */
  def contaminationFlags(docs: org.apache.spark.sql.DataFrame,
      bloom: Array[Byte]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    docs.withColumn("maybe_contaminated",
      exists(array_distinct(VectorExprs.charNgrams(col("text"), 20)),
        g => org.apache.spark.sql.GraftBridge.column(
          BloomFilterMightContain(Literal(bloom, BinaryType),
            org.apache.spark.sql.GraftBridge.expression(xxhash64(g))))))
  }

  /** The two persisted signature tables of the incremental flow — the
    * standing corpus (doc_id % 10 != 0) and the newly-arrived batch
    * (doc_id % 10 = 0) — written once per (session, corpus) with equal
    * bucket counts on `bkey` so every candidate join below reads
    * co-located buckets with no Exchange.
    */
  private val incMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), (String, String)]()
  graft.Memos.register { () => incMemo.clear() }
  private[graft] def incrementalSigTables(s: org.apache.spark.sql.SparkSession,
      d: String): (String, String) =
    incMemo.computeIfAbsent((s, d), { _ =>
      val suffix = graft.Memos.pathToken(d)
      val docs = Tables.documents(s, d)
      val ct = s"graft_sig_corpus_$suffix"
      val bt = s"graft_sig_batch_$suffix"
      writeSignatureTableFor(docs.filter(col("doc_id") % 10 =!= 0), ct, 8)
      writeSignatureTableFor(docs.filter(col("doc_id") % 10 === 0), bt, 8)
      (ct, bt)
    })

  /** STREAMING incremental dedup flags — q48's decision as documents
    * ARRIVE: each micro-batch computes its banded MinHash signatures
    * in-stream (a stateless projection + explode, so no watermark or
    * state store is needed) and stream-static joins the PERSISTED corpus
    * signature table on the band key. A new doc emits one flag row per
    * colliding band (at-least-once — consumers keep-first per doc_id);
    * docs with no flag are novel. The corpus side is the bucketed
    * catalog table, never re-shuffled. Exercised by StreamDedupSpec via
    * MemoryStream.
    */
  def streamDupFlags(newDocs: org.apache.spark.sql.DataFrame,
      corpusSigTable: String): org.apache.spark.sql.DataFrame = {
    val corpus = newDocs.sparkSession.table(corpusSigTable)
      .withColumnRenamed("doc_id", "corpus_doc_id")
    bandedSignatures(newDocs)
      .select(col("doc_id"), concat_ws(":", col("band"), col("key")).as("bkey"))
      .join(corpus, "bkey")
      .select(col("doc_id"), col("corpus_doc_id"), col("bkey"))
  }

  // q48 — INCREMENTAL dedup: the production corpus-refresh flow. The
  // standing corpus keeps a persisted bucketed signature table; a new
  // batch arrives, writes its (small) signature table with the same
  // bucketing, and the keep-list update is two exchange-free joins over
  // co-located buckets: batch-vs-corpus (already-seen content) and
  // batch-vs-batch (duplicates inside the batch, keep-first by id). A
  // batch doc enters the corpus iff it collides with nothing older.
  // The corpus is NEVER re-scanned or re-shuffled — at 100 TB the
  // refresh cost is O(batch), not O(corpus). Band keys are the
  // engine-portable signature values, so the DuckDB oracle replays the
  // full incremental decision.
  val q48: QueryDef = QueryDef.sql(
    "q48_incremental_dedup",
    s"""WITH $minhashBandedDuck,
      |corpus AS (SELECT doc_id, band, key FROM banded WHERE doc_id % 10 != 0),
      |batch AS (SELECT doc_id, band, key FROM banded WHERE doc_id % 10 = 0),
      |cross_hits AS (
      |  SELECT b.doc_id, count(DISTINCT c.doc_id) AS n_corpus_hits
      |  FROM batch b JOIN corpus c ON b.band = c.band AND b.key = c.key
      |  GROUP BY b.doc_id),
      |self_hits AS (
      |  SELECT b.doc_id, count(DISTINCT a.doc_id) AS n_batch_hits
      |  FROM batch b JOIN batch a
      |    ON b.band = a.band AND b.key = a.key AND a.doc_id < b.doc_id
      |  GROUP BY b.doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(ch.n_corpus_hits, 0) AS BIGINT) AS n_corpus_hits,
      |  CAST(coalesce(sh.n_batch_hits, 0) AS BIGINT) AS n_batch_hits,
      |  coalesce(ch.n_corpus_hits, 0) = 0 AND coalesce(sh.n_batch_hits, 0) = 0 AS keep
      |FROM (SELECT DISTINCT doc_id FROM batch) d
      |LEFT JOIN cross_hits ch ON d.doc_id = ch.doc_id
      |LEFT JOIN self_hits sh ON d.doc_id = sh.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val (corpusT, batchT) = incrementalSigTables(s, d)
    val corpus = s.table(corpusT)
    val batch = s.table(batchT)
    val crossHits = batch.as("b")
      .join(corpus.as("c"), col("b.bkey") === col("c.bkey"))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(count_distinct(col("c.doc_id")).as("n_corpus_hits"))
    val selfHits = batch.as("b")
      .join(batch.as("a"),
        col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(count_distinct(col("a.doc_id")).as("n_batch_hits"))
    batch.select("doc_id").distinct()
      .join(crossHits, Seq("doc_id"), "left")
      .join(selfHits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_corpus_hits"), lit(0L)).as("n_corpus_hits"),
        coalesce(col("n_batch_hits"), lit(0L)).as("n_batch_hits"),
        (coalesce(col("n_corpus_hits"), lit(0L)) === 0 &&
          coalesce(col("n_batch_hits"), lit(0L)) === 0).as("keep"))
      .orderBy("doc_id")
  }

  // q49 — cross-document SUBSTRING duplication (the train-vs-train
  // repeated-long-substring signal; doc-level dedup misses passages
  // copied between otherwise-different docs). Strided 50-char grams
  // (every 10th position — the shuffle-friendly approximation of the
  // suffix-array formulation) key ONE shuffle; a gram seen in ≥2 docs is
  // duplicated text, and each doc reports how much of it it carries.
  // Fractions are one IEEE division of exact ints — unrounded, engines
  // agree bit-for-bit.
  val q49: QueryDef = QueryDef.sql(
    "q49_substring_dup",
    """WITH g AS (
      |  SELECT DISTINCT doc_id, u.gram
      |  FROM documents,
      |    unnest(list_transform(range(1, greatest(length(text) - 48, 1), 10),
      |      i -> substr(text, CAST(i AS INT), 50))) AS u(gram)),
      |dup AS (
      |  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
      |per_doc AS (
      |  SELECT g.doc_id, count(*) AS n_grams,
      |    count(*) FILTER (WHERE dup.gram IS NOT NULL) AS n_dup_grams
      |  FROM g LEFT JOIN dup ON g.gram = dup.gram
      |  GROUP BY g.doc_id)
      |SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams,
      |  CAST(n_dup_grams AS INTEGER) AS n_dup_grams,
      |  CAST(n_dup_grams AS DOUBLE) / n_grams AS dup_frac
      |FROM per_doc
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // sequence() errors on start > stop, so short docs keep a 1-element
    // sequence whose undersized gram the length filter drops (mirrors
    // DuckDB's empty range for len < 50)
    val g = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(
        "filter(transform(sequence(1, greatest(length(text) - 49, 1), 10), i -> substring(text, i, 50)), x -> length(x) = 50)")).as("gram"))
      .distinct()
    val dup = g.groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select("gram")
    g.join(dup.withColumn("is_dup", lit(1)), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("is_dup")).as("n_dup_grams"))
      .select(col("doc_id"), col("n_grams").cast("int").as("n_grams"),
        col("n_dup_grams").cast("int").as("n_dup_grams"),
        (col("n_dup_grams").cast("double") / col("n_grams")).as("dup_frac"))
      .orderBy("doc_id")
  }

  // q99 — the DATASET CARD: the one-row statistics sheet a curated
  // corpus ships with (datasheet/dataset-card shape). Each signal is an
  // O(1)-output aggregate over ONE corpus scan (Spark collapses the
  // multi-aggregate into a single pass with map-side partials): corpus
  // size, language spread, token volume, quality-keep rate (q61's
  // rule), exact-duplicate rate (q40's rule, distinct-hash count), and
  // mean doc length. At 100 TB this is one scan + O(1) rows moved.
  val q99: QueryDef = QueryDef.sql(
    "q99_dataset_card",
    """WITH m AS (
      |  SELECT doc_id, lang, md5(text) AS h,
      |    length(text) AS n_char,
      |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      t -> t = 'the' OR t = 'a' OR t = 'value')) AS n_stop
      |  FROM documents)
      |SELECT
      |  count(*) AS n_docs,
      |  count(DISTINCT lang) AS n_langs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_ws_tokens,
      |  round(avg(CAST(n_char AS DOUBLE)), 4) AS avg_doc_chars,
      |  CAST(sum(CASE WHEN n_tok >= 20 AND n_char >= 100 AND n_stop > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_keep,
      |  CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups
      |FROM m""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"),
        length(col("text")).as("n_char"),
        expr("size(split(trim(text), '\\\\s+'))").as("n_tok"),
        expr("size(filter(split(trim(text), '\\\\s+'), " +
          "t -> t = 'the' OR t = 'a' OR t = 'value'))").as("n_stop"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("lang")).as("n_langs"),
        sum("n_tok").cast("long").as("total_ws_tokens"),
        round(avg(col("n_char").cast("double")), 4).as("avg_doc_chars"),
        sum(when(col("n_tok") >= 20 && col("n_char") >= 100 && col("n_stop") > 0, 1L)
          .otherwise(0L)).as("n_quality_keep"),
        (count(lit(1)) - count_distinct(col("h"))).cast("long").as("n_exact_dups"))
  }

  // q109 — EDIT-DISTANCE near-dup verification: the same LSH candidate
  // funnel as q41 (band value is the shuffle key, ids-only pair join),
  // reranked by exact Levenshtein distance instead of n-gram Jaccard —
  // the check a pipeline runs when "near duplicate" must mean "few
  // character edits" (templated spam, boilerplate variants), not just
  // shared shingles. One codegen'd levenshtein per CANDIDATE pair —
  // the corpus never enters a pair join. Integer distances → the
  // DuckDB oracle replays the whole funnel hash-exactly.
  val q109: QueryDef = QueryDef.sql(
    "q109_dedup_edit_distance",
    s"""WITH $minhashBandedDuck,
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
      |SELECT c.id_a, c.id_b,
      |  CAST(levenshtein(da.text, db.text) AS INTEGER) AS edit_dist
      |FROM cand c JOIN documents da ON c.id_a = da.doc_id
      |            JOIN documents db ON c.id_b = db.doc_id
      |WHERE levenshtein(da.text, db.text) <= 40
      |ORDER BY edit_dist, id_a, id_b
      |LIMIT 50""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val banded = bandedCached(s, d).select("doc_id", "band", "key")
    val cand = banded.select(col("band"), col("key"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("key"), col("doc_id").as("id_b")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      // both pruning steps are semantically free against the ≤40 gate:
      // a length gap > 40 already implies distance > 40, and the
      // THRESHOLD levenshtein runs the banded O(k·len) DP with early
      // exit (-1 past the bound) instead of the full O(len²) table —
      // 24 s → ~1 s at sf0.1 over the same candidates
      .filter(abs(length(col("text_a")) - length(col("text_b"))) <= 40)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("text_a"), col("text_b"), 40).cast("int").as("edit_dist"))
      .filter(col("edit_dist") =!= -1)
      .orderBy(asc("edit_dist"), asc("id_a"), asc("id_b"))
      .limit(50)
  }

  // q115 — the CURATION FUNNEL end to end: quality gate → exact dedup
  // (keep-first per content hash) → decontamination (any shared
  // eval 20-gram drops the doc; the eval slice itself leaves the
  // corpus) → weighted token-budget fill — each stage the operator the
  // catalog already verifies in isolation (q61/q40/q47/q103), composed
  // into ONE plan whose per-stage (docs, tokens) funnel the oracle
  // replays hash-exactly. This is the "engine as a pipeline" proof:
  // stages chain as DataFrames with no materialization between them,
  // and every scale posture (broadcast eval grams, content-hash
  // keep-first, budget window) carries over unchanged. The budget
  // window here is the naive per-source form — survivors are already
  // quota-bounded by the upstream gates; q103 holds the histogram-prune
  // scale path for budget-filling a RAW corpus.
  val q115: QueryDef = QueryDef.sql(
    "q115_curation_funnel",
    """WITH q AS (
      |  SELECT doc_id, source, text,
      |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
      |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |      t -> t = 'the' OR t = 'a' OR t = 'value')) AS n_stop
      |  FROM documents),
      |quality AS (
      |  SELECT * FROM q
      |  WHERE n_tok >= 20 AND length(text) >= 100 AND n_stop > 0),
      |dedup AS (
      |  SELECT * FROM quality WHERE doc_id IN
      |    (SELECT min(doc_id) FROM quality GROUP BY md5(text))),
      |eg AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |    i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |  FROM documents WHERE doc_id % 50 = 0),
      |conta AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |      i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |    FROM dedup WHERE doc_id % 50 != 0) t JOIN eg USING (gram)),
      |decon AS (
      |  SELECT * FROM dedup WHERE doc_id % 50 != 0
      |    AND doc_id NOT IN (SELECT doc_id FROM conta)),
      |tot AS (SELECT SUM(n_tok) AS tt FROM decon),
      |win AS (
      |  SELECT d.*, FLOOR(0.25 * tt * ((CAST(substr(source, 4) AS INTEGER) % 4) + 1) / 50.0) AS quota,
      |    SUM(n_tok) OVER (PARTITION BY source
      |      ORDER BY CAST(ROUND(1000.0 * n_stop / n_tok) AS INTEGER) DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM decon d, tot),
      |budget AS (SELECT * FROM win WHERE cum - n_tok < quota)
      |SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_tokens AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT '0_corpus' AS stage, count(*) AS n_docs, SUM(n_tok) AS n_tokens FROM q
      |  UNION ALL SELECT '1_quality', count(*), SUM(n_tok) FROM quality
      |  UNION ALL SELECT '2_exact_dedup', count(*), SUM(n_tok) FROM dedup
      |  UNION ALL SELECT '3_decontaminated', count(*), SUM(n_tok) FROM decon
      |  UNION ALL SELECT '4_token_budget', count(*), SUM(n_tok) FROM budget)
      |ORDER BY stage""".stripMargin) { (s, d) => curationFunnel(s, d) }

  /** q115's builder. `eager = true` (the catalog entry) persists the two
    * fan-out frames, evaluates the five 1-row stage aggregates, releases
    * the caches, and returns the result as a local relation — cache
    * lifetime stays inside the call. `eager = false` returns the fully
    * lazy composed plan so PlanSpec can assert the budget stage's shape
    * (one Window, fed by the boundary-pruned candidates).
    */
  private[graft] def curationFunnel(s: SparkSession, d: String,
      eager: Boolean = true): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = "split(trim(text), '\\\\s+')"
    val q = docs.select(col("doc_id"), col("source"), col("text"),
      expr(s"size($toks)").as("n_tok"),
      expr(s"size(filter($toks, t -> t = 'the' OR t = 'a' OR t = 'value'))")
        .as("n_stop"))
    val quality = q.filter(col("n_tok") >= 20 &&
      length(col("text")) >= 100 && col("n_stop") > 0)
    val keepFirst = quality.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val dedup = quality.join(keepFirst, Seq("doc_id"), "left_semi")
    val evalGrams = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(array_distinct(
        VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .distinct()
    val nonEval = dedup.filter(col("doc_id") % 50 =!= 0)
    val conta = nonEval
      .select(col("doc_id"), explode(array_distinct(
        VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .select("doc_id").distinct()
    // The funnel fans out: dedup feeds its own stage row PLUS the gram
    // explode PLUS the anti-join; decon feeds the corpus-total read, the
    // boundary histogram, and two stage rows. Unpersisted, each consumer
    // re-runs the whole upstream funnel — 4 recomputes of the gram join
    // at any scale. Persist the two fan-out points instead (disk-backed,
    // the standard inter-stage checkpoint on a cluster); decon drops the
    // text payload first — nothing downstream of decontamination reads
    // text, so the cached survivor set is 3 narrow columns, not the
    // corpus. Both caches release before the (driver-local, 5-row)
    // result returns.
    val dedupC = if (eager) dedup.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else dedup
    val deconNarrow = nonEval.join(conta, Seq("doc_id"), "left_anti")
      .select("doc_id", "source", "n_tok", "n_stop")
    val deconC = if (eager) deconNarrow.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else deconNarrow
    val decon = deconC
    val tt = decon.agg(sum("n_tok")).take(1).head.getAs[Long](0)
    // stage 4 token budget: the naive shape is a per-source cumulative
    // window over EVERY surviving document — a multi-TB single-task sort
    // per source at 100 TB. q103 solved the identical problem with a
    // bounded (source, qkey) token histogram that finds each source's
    // boundary quality key first; reuse it here so the window runs over
    // ≈ quota tokens per source. The composed DuckDB oracle replays the
    // UNPRUNED window and must hash-match — the prune is proven lossless
    // every round, not assumed.
    val scored = decon
      .withColumn("qkey",
        expr("cast(round(1000.0 * n_stop / n_tok) as int)"))
      .withColumn("w",
        expr("cast(substring(source, 4, 8) as int)") % 4 + 1)
    val byQ = Window.partitionBy("source")
      .orderBy(desc("qkey"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = graft.text.TextAnalysis.boundaryPrune(s, scored, tt)
      .withColumn("cum", sum("n_tok").over(byQ))
      .withColumn("quota", floor(lit(0.25) * lit(tt) * col("w") / lit(50.0)))
      .filter(col("cum") - col("n_tok") < col("quota"))
    def stage(name: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("nd"), sum("n_tok").as("nt"))
        .select(lit(name).as("stage"),
          col("nd").cast("bigint").as("n_docs"),
          col("nt").cast("bigint").as("n_tokens"))
    val funnel = stage("0_corpus", q)
      .unionByName(stage("1_quality", quality))
      .unionByName(stage("2_exact_dedup", dedup))
      .unionByName(stage("3_decontaminated", decon))
      .unionByName(stage("4_token_budget", budget))
      .orderBy("stage")
    if (!eager) funnel
    else {
      // evaluate the five 1-row stage aggregates while the checkpoints
      // are live, then release them — the result is a bounded driver
      // read (one row per funnel stage) and returning it as a local
      // relation keeps the caches' lifetime inside this call instead of
      // leaking persisted corpus frames into the session
      val rows = funnel.take(8)
      dedupC.unpersist(false)
      deconC.unpersist(false)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), funnel.schema)
    }
  }

  // q117 — LEAKAGE-GUARDED TRAIN/TEST SPLIT: the decontaminated-split
  // primitive an eval pipeline needs — a deterministic hash split
  // (q23's Knuth-multiplicative rule on doc_id, ~80/20) where any TRAIN
  // doc sharing a 20-char gram with any TEST doc is moved to a third
  // `quarantined` bucket instead of silently leaking eval text into
  // training. Composition of existing scale postures, no new shuffle
  // class: the test-side gram set broadcasts (q47's shape — at 100 TB
  // the q75 Bloom build replaces the broadcast, same decision), the
  // train side probes map-side, and the only data shuffle is the
  // O(leaked-docs) distinct. Output is per-doc (doc_id, split) so a
  // downstream reader can join it as the split assignment table; the
  // DuckDB oracle replays split + gram join + quarantine hash-exactly.
  val q117: QueryDef = QueryDef.sql(
    "q117_leakage_split",
    """WITH s AS (
      |  SELECT doc_id, text,
      |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 97 < 78
      |      THEN 'train' ELSE 'test' END AS split
      |  FROM documents),
      |eg AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |    i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |  FROM s WHERE split = 'test'),
      |leak AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |      i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |    FROM s WHERE split = 'train') t JOIN eg USING (gram))
      |SELECT doc_id,
      |  CASE WHEN split = 'train' AND doc_id IN (SELECT doc_id FROM leak)
      |    THEN 'quarantined' ELSE split END AS split
      |FROM s
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("split",
        when(((col("doc_id") % 1000003L) * 2654435761L % 97L) < 78, "train")
          .otherwise("test"))
    val testGrams = docs.filter(col("split") === "test")
      .select(explode(array_distinct(
        VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .distinct()
    val leaked = docs.filter(col("split") === "train")
      .select(col("doc_id"), explode(array_distinct(
        VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .join(broadcast(testGrams), "gram")
      .select("doc_id").distinct()
    docs.join(leaked.withColumn("leak", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("split") === "train" && col("leak"), "quarantined")
          .otherwise(col("split")).as("split"))
      .orderBy("doc_id")
  }

  // q122 — MULTI-BENCHMARK CONTAMINATION REPORT: q47's decision, but
  // against N eval sets AT ONCE with per-benchmark severity — the
  // dashboard a lab reads before a release ("how much of the corpus
  // touches each benchmark, and how hard"). ONE corpus gram pass serves
  // all benchmarks: the (eval_set, gram) table unions every benchmark's
  // grams and broadcasts once (tagged rows — a doc hitting two sets
  // counts in both), the train side explodes once and probes map-side;
  // the only shuffles are the O(contaminated docs) per-(set, doc) count
  // and the O(sets) rollup. Rate is one IEEE division by the train
  // count (broadcast scalar), so rows hash-match.
  val q122: QueryDef = QueryDef.sql(
    "q122_contamination_report",
    """WITH s AS (
      |  SELECT doc_id, text, CAST(doc_id % 50 AS INTEGER) AS b FROM documents),
      |eg AS (
      |  SELECT DISTINCT eval_set, gram FROM (
      |    SELECT b AS eval_set, unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |      i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |    FROM s WHERE b < 3) x),
      |hits AS (
      |  SELECT eval_set, doc_id, count(*) AS n_shared
      |  FROM (
      |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, length(text) - 18),
      |      i -> substr(text, CAST(i AS INT), 20)))) AS gram
      |    FROM s WHERE b >= 3) tg JOIN eg USING (gram)
      |  GROUP BY eval_set, doc_id)
      |SELECT eval_set,
      |  CAST(count(*) AS BIGINT) AS n_contaminated,
      |  CAST(sum(n_shared) AS BIGINT) AS n_gram_hits,
      |  CAST(max(n_shared) AS BIGINT) AS max_shared,
      |  CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM s WHERE b >= 3) AS contamination_rate
      |FROM hits
      |GROUP BY eval_set
      |ORDER BY eval_set""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("b", (col("doc_id") % 50).cast("int"))
    val evalGrams = docs.filter(col("b") < 3)
      .select(col("b").as("eval_set"),
        explode(array_distinct(VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .distinct()
    val train = docs.filter(col("b") >= 3)
    val nTrain = train.agg(count(lit(1)).cast("double").as("n_train"))
    train
      .select(col("doc_id"),
        explode(array_distinct(VectorExprs.charNgrams(col("text"), 20))).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy("eval_set", "doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .groupBy("eval_set")
      .agg(count(lit(1)).as("n_contaminated"),
        sum("n_shared").as("n_gram_hits"),
        max("n_shared").as("max_shared"))
      .crossJoin(broadcast(nTrain))
      .select(col("eval_set"), col("n_contaminated"), col("n_gram_hits"),
        col("max_shared"),
        (col("n_contaminated").cast("double") / col("n_train")).as("contamination_rate"))
      .orderBy("eval_set")
  }

  // q125 — SURVIVORSHIP DEDUP: q45 keeps the min-id member of each
  // near-dup cluster; real curation keeps the BEST one — here the
  // longest text (the most complete copy of duplicated content; ties →
  // lowest doc_id), with an `upgraded` flag wherever the quality pick
  // differs from the naive keep-first. The cluster labels are memoized
  // with q45 (same connected components), the length join is ids-only
  // (O(cluster members), broadcast — never the corpus), and the argmax
  // is a window over cluster-sized partitions. The recursive-CTE oracle
  // replays closure + argmax hash-exactly.
  val q125: QueryDef = QueryDef.sql(
    "q125_dedup_survivorship",
    s"""WITH RECURSIVE $minhashSigDuck,
       |edges AS (
       |  SELECT id_a AS s, id_b AS t FROM cpairs
       |  UNION
       |  SELECT id_b AS s, id_a AS t FROM cpairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT e.s, rr.r FROM edges e JOIN reach rr ON rr.id = e.t),
       |labels AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
       |ranked AS (
       |  SELECT l.label, l.id, length(doc.text) AS n_char,
       |    row_number() OVER (PARTITION BY l.label
       |      ORDER BY length(doc.text) DESC, l.id) AS rk
       |  FROM labels l JOIN documents doc ON doc.doc_id = l.id)
       |SELECT label AS cluster_id,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(min(id) AS BIGINT) AS first_id,
       |  CAST(max(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS survivor_id,
       |  CAST(max(CASE WHEN rk = 1 THEN n_char END) AS INTEGER) AS survivor_len,
       |  (max(CASE WHEN rk = 1 THEN id END) != min(id)) AS upgraded
       |FROM ranked
       |GROUP BY label
       |ORDER BY cluster_id""".stripMargin) { (s, d) =>
    val lens = Tables.documents(s, d)
      .select(col("doc_id").as("id"), length(col("text")).as("n_char"))
    val byBest = Window.partitionBy("label")
      .orderBy(desc("n_char"), asc("id"))
    // labels (cluster members only) are the small side — broadcast THEM
    // and stream the corpus-scan side map-side
    lens.join(broadcast(clusterLabels(s, d)), "id")
      .withColumn("rk", row_number().over(byBest))
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min("id").as("first_id"),
        max(when(col("rk") === 1, col("id"))).as("survivor_id"),
        max(when(col("rk") === 1, col("n_char"))).as("survivor_len"),
        (max(when(col("rk") === 1, col("id"))) =!= min(col("id"))).as("upgraded"))
      .orderBy("cluster_id")
  }

  // q128 — DUPLICATE PROVENANCE MATRIX: which sources copy from which —
  // q42's strongest near-dup candidates rolled up by source pair (self
  // pairs = internal duplication, cross pairs = syndication/mirroring;
  // the matrix a provenance audit reads before deciding which feed to
  // drop). The pair table is BOUNDED (q42's top-1000), so it broadcasts
  // against the corpus for both id lookups — the corpus never shuffles;
  // the rollup moves O(sources²) rows. Mean jaccard is a multi-term
  // double aggregate → rounded per the oracle rule.
  val q128: QueryDef = QueryDef.sql(
    "q128_dup_provenance",
    s"""WITH $minhashSigDuck
       |SELECT least(da.source, db.source) AS src_a,
       |  greatest(da.source, db.source) AS src_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  round(avg(est_jaccard), 6) AS mean_jaccard
       |FROM cpairs p
       |JOIN documents da ON da.doc_id = p.id_a
       |JOIN documents db ON db.doc_id = p.id_b
       |GROUP BY 1, 2
       |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val pairs = q42.fn(s, d).select("id_a", "id_b", "est_jaccard")
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    // both lookups broadcast the BOUNDED side (pairs, then the ≤1000-row
    // half-resolved frame); the corpus scan streams map-side twice
    val half = docs.join(broadcast(pairs), col("doc_id") === col("id_a"))
      .select(col("source").as("source_a"), col("id_b"), col("est_jaccard"))
    docs.withColumnRenamed("source", "source_b")
      .join(broadcast(half), col("doc_id") === col("id_b"))
      .groupBy(least(col("source_a"), col("source_b")).as("src_a"),
        greatest(col("source_a"), col("source_b")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("est_jaccard"), 6).as("mean_jaccard"))
      .orderBy("src_a", "src_b")
  }

  // q131 — SOURCE OVERLAP MATRIX: corpus-level Jaccard between every
  // source pair, estimated from per-source MinHash signatures — the
  // macro view q128's doc-pair matrix samples (q128 answers "which docs
  // were copied"; q131 answers "how much of source A's shingle space is
  // source B's", the number a feed-selection decision reads). The union
  // property makes this exchange-cheap: a set union's MinHash is the
  // ELEMENTWISE MIN of member signatures, so each source's signature
  // aggregates from the same one-scan signature pass q42 uses — the only
  // corpus-wide exchange is keyed (source, perm) with a map-side partial
  // min and O(sources·16) output, and the pairwise compare is a
  // broadcast inequality join over O(sources) rows. Never O(docs²), and
  // doc-count-independent after the scan — at 100 TB this is one read
  // plus kilobytes of state. est_jaccard is a single int/16 division —
  // exact, unrounded.
  val q131: QueryDef = QueryDef.sql(
    "q131_source_overlap",
    """WITH shs AS (
      |  SELECT source, list_transform(range(1, greatest(length(text) - 3, 1)),
      |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(range(0, 5),
      |               c -> CAST(unicode(substr(text, CAST(i + c AS INT), 1)) AS BIGINT))),
      |           (a, b) -> (a * 131 + b) % 1000000007)) AS sh
      |  FROM documents),
      |sig AS (
      |  SELECT source, list_transform(range(0, 16),
      |      j -> coalesce(list_min(list_transform(sh,
      |             h -> ((1103515245 + 12345 * j) * h + 1013904223 + 7 * j) % 2147483647)), 0)) AS sig
      |  FROM shs),
      |smin AS (
      |  SELECT source, j, min(sig[CAST(j + 1 AS INT)]) AS h
      |  FROM sig, (SELECT unnest(range(0, 16)) AS j) pos
      |  GROUP BY source, j),
      |ssig AS (SELECT source, list(h ORDER BY j) AS sig FROM smin GROUP BY source)
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(len(list_filter(range(1, 17),
      |    i -> a.sig[CAST(i AS INT)] = b.sig[CAST(i AS INT)])) AS INTEGER) AS n_perm_match,
      |  CAST(len(list_filter(range(1, 17),
      |    i -> a.sig[CAST(i AS INT)] = b.sig[CAST(i AS INT)])) AS DOUBLE) / 16 AS est_jaccard
      |FROM ssig a JOIN ssig b ON a.source < b.source
      |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    val sigs = Tables.documents(s, d)
      .select(col("source"),
        VectorExprs.minHashSig(col("text"), k = 5, nPerm = MinhashPerms).as("sig"))
      .select(col("source"), posexplode(col("sig")).as(Seq("j", "h")))
      .groupBy("source", "j").agg(min("h").as("h"))
      .groupBy("source")
      .agg(array_sort(collect_list(struct(col("j"), col("h")))).as("jh"))
      .select(col("source"), expr("transform(jh, x -> x.h)").as("sig"))
    val a = sigs.select(col("source").as("src_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("source").as("src_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), e -> e))")
          .cast("int").as("n_perm_match"))
      .withColumn("est_jaccard", col("n_perm_match").cast("double") / 16)
      .orderBy("src_a", "src_b")
  }

  /** A SnapshotTable of the documents corpus with one append in its
    * lineage — the standing-corpus-plus-arriving-batch shape, memoized
    * per (session, corpus dir). v0 = standing corpus (doc_id % 10 != 0),
    * v1 = v0 + the batch (doc_id % 10 = 0).
    */
  private val snapMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), (String, Long, Long)]()
  graft.Memos.register { () => snapMemo.clear() }
  private def snapshotDocTable(s: org.apache.spark.sql.SparkSession,
      d: String): (String, Long, Long) =
    snapMemo.computeIfAbsent((s, d), { _ =>
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft-snapdocs-${graft.Memos.pathToken(d)}").toString + "/docs"
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val v0 = graft.sources.SnapshotTable.commit(s, dir,
        docs.filter(col("doc_id") % 10 =!= 0))
      val v1 = graft.sources.SnapshotTable.append(s, dir,
        docs.filter(col("doc_id") % 10 === 0))
      (dir, v0, v1)
    })

  // q132 — SNAPSHOT-DELTA signature refresh: the index-maintenance face
  // of incremental dedup. An append lands as snapshot v1 over corpus v0;
  // the signature job reads ONLY the files v1 added (SnapshotTable
  // .changes — immutable data files make the delta exact) and computes
  // banded MinHash signatures for just those rows. At 100 TB this is the
  // whole point of the table format: index refresh costs O(new data) and
  // never re-reads or re-shuffles the standing corpus. The oracle replays
  // the same decision from the batch predicate, proving the file-level
  // delta selects exactly the appended rows.
  val q132: QueryDef = QueryDef.sql(
    "q132_snapshot_delta_sigs",
    s"""WITH $minhashBandedDuck
      |SELECT doc_id, band, key FROM banded
      |WHERE doc_id % 10 = 0
      |ORDER BY doc_id, band""".stripMargin) { (s, d) =>
    val (dir, v0, v1) = snapshotDocTable(s, d)
    require(graft.sources.SnapshotTable.isAppendLineage(s, dir, v0, v1),
      "delta signature refresh requires an append-only lineage")
    bandedSignatures(graft.sources.SnapshotTable.changes(s, dir, v0, v1))
      .select(col("doc_id"), col("band").cast("long").as("band"), col("key"))
      .orderBy("doc_id", "band")
  }

  // q138 — DEDUP THRESHOLD SWEEP: the "pick your Jaccard cutoff" curve —
  // for each candidate threshold, how many near-dup pairs fire and how
  // many docs get flagged (have a more-similar twin with a lower id).
  // Run BEFORE committing a dedup pass: the curve's knee separates "the
  // corpus has a verbatim-copy problem" (flat until 0.9) from "the
  // threshold is doing the work" (steep everywhere). Scale shape: the
  // expensive object — the LSH-blocked candidate-pair Jaccard table
  // (q41's rerank, bounded by band-bucket fan-out, never O(n²)) — is
  // computed ONCE; the sweep is a 5-row threshold table broadcast-
  // nested-loop joined against it, so 5 thresholds cost one pair pass,
  // not five dedup runs. The left join keeps zero-count thresholds.
  val q138: QueryDef = QueryDef.sql(
    "q138_dedup_threshold_sweep",
    s"""WITH $minhashBandedDuck,
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INT), 3))) AS grams
      |  FROM documents),
      |pj AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
      |  FROM cand c JOIN g a ON c.id_a = a.doc_id JOIN g b ON c.id_b = b.doc_id),
      |taus AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS tau)
      |SELECT t.tau,
      |  CAST(count(p.id_a) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT p.id_b) AS BIGINT) AS n_docs_flagged
      |FROM taus t LEFT JOIN pj p ON p.jaccard >= t.tau
      |GROUP BY t.tau
      |ORDER BY t.tau""".stripMargin) { (s, d) =>
    import s.implicits._
    val pj = candidatePairJaccard(s, d)
    val taus = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("tau")
    broadcast(taus)
      .join(pj, pj("jaccard") >= taus("tau"), "left")
      .groupBy("tau")
      .agg(count(col("id_a")).as("n_pairs"),
        countDistinct(col("id_b")).as("n_docs_flagged"))
      .orderBy("tau")
  }

  // q145 — MINHASH CALIBRATION AUDIT: is the sketch telling the truth?
  // For every LSH candidate pair, the MinHash ESTIMATE (fraction of the
  // 16 permutation minima that agree — the statistic banding thresholds
  // are derived from) against the EXACT 3-gram Jaccard, grouped into the
  // 17 possible estimate levels with the exact similarity's
  // mean/min/max per level. A well-calibrated sketch tracks the
  // diagonal; drift says the permutation family or shingle size is
  // wrong for this corpus BEFORE a threshold is trusted at 100 TB.
  // Scale shape: q138's posture — the candidate-pair table is the only
  // expensive object, computed once; signatures join in keyed by doc_id
  // (ids-only pair shuffle), and the rollup output is ≤17 rows.
  val q145: QueryDef = QueryDef.sql(
    "q145_minhash_calibration",
    s"""WITH $minhashBandedDuck,
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, length(text) - 1),
      |    i -> substr(text, CAST(i AS INT), 3))) AS grams
      |  FROM documents),
      |pj AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard,
      |    len(list_filter(range(1, 17),
      |      i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)])) / 16.0 AS est
      |  FROM cand c
      |  JOIN g a ON c.id_a = a.doc_id JOIN g b ON c.id_b = b.doc_id
      |  JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id)
      |SELECT est, CAST(count(*) AS BIGINT) AS n_pairs,
      |  round(avg(jaccard), 6) AS mean_jaccard,
      |  min(jaccard) AS min_jaccard, max(jaccard) AS max_jaccard
      |FROM pj GROUP BY est
      |ORDER BY est""".stripMargin) { (s, d) =>
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), VectorExprs.minHashSig(col("text")).as("sig"))
    candidatePairJaccard(s, d)
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("jaccard"),
        (expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))")
          / 16.0).as("est"))
      .groupBy("est")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("jaccard"), 6).as("mean_jaccard"),
        min("jaccard").as("min_jaccard"),
        max("jaccard").as("max_jaccard"))
      .orderBy("est")
  }

  /** q203's core over any (vec_id, embedding) frame: for every EVAL
    * vector (vec_id % 50 = 0, the house eval-slice convention), its
    * top-1 train cosine, the mean of its top-8 (the Artetxe–Schwenk
    * margin denominator), margin, and the ≥ `threshold` contamination
    * flag. Factored so the spec can plant a true duplicate — the
    * synthetic corpus has none (random embeddings, max top-1 ≈ 0.43).
    */
  private[graft] def semanticDecon(v0: org.apache.spark.sql.DataFrame,
      threshold: Double = 0.9): org.apache.spark.sql.DataFrame = {
    val v = v0.select(col("vec_id"), col("embedding"),
      sqrt(VectorExprs.dotProduct(col("embedding"), col("embedding")))
        .as("nrm"))
    val e = v.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("eval_id"), col("embedding").as("eemb"),
        col("nrm").as("enrm"))
    val t = v.filter(col("vec_id") % 50 =!= 0)
    // train scans ONCE against the broadcast eval set (eval sets are
    // small by nature — benchmarks); the bounded top-k aggregate keeps
    // 8 rows per eval in the map-side partial, so the shuffle carries
    // O(evals·8·partitions) rows — never the evals×train pair stream.
    // The all-pairs cosine here is the EXACT tier; at extreme train
    // counts the q53 IVF probe path is the documented substitute.
    val pairs = t.crossJoin(broadcast(e))
      .select(col("eval_id"), col("vec_id").as("train_id"),
        (VectorExprs.dotProduct(col("embedding"), col("eemb"))
          / (col("nrm") * col("enrm"))).as("c"))
    val topk = org.apache.spark.sql.GraftBridge.column(
      graft.functions.TopKNbrAgg(
        org.apache.spark.sql.GraftBridge.expression(col("c")),
        org.apache.spark.sql.GraftBridge.expression(col("train_id")),
        8).toAggregateExpression())
    pairs.groupBy("eval_id").agg(topk.as("nbrs"))
      .select(col("eval_id"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("eval_id"), (col("pos") + 1).as("rn"),
        col("nbr._2").as("train_id"), col("nbr._1").as("c"))
      .groupBy("eval_id")
      .agg(max(when(col("rn") === 1, col("train_id"))).as("train_id"),
        max(when(col("rn") === 1, col("c"))).as("cos_top1"),
        // the top-8 cosines are already on the 1e-8 grid (TopKNbr's
        // round), so the mean is computed as an EXACT integer sum over
        // that grid + one division — an 8-term double average lands on
        // rounding razor edges (measured at sf0.001: 8th decimal flip
        // between engines from summation order)
        (sum(expr("cast(round(c * 1e8) as bigint)")).cast("double")
          / (count(lit(1)) * lit(1.0e8))).as("mean_top8"))
      .select(col("eval_id"), col("train_id"), col("cos_top1"),
        col("mean_top8"),
        round(col("cos_top1") / col("mean_top8"), 6).as("margin"),
        (col("cos_top1") >= threshold).as("contaminated"))
      .orderBy("eval_id")
  }

  // q203 — SEMANTIC DECONTAMINATION: the third leg of the
  // decontamination family — q47/q122 catch exact 20-gram overlap, q75
  // scales that with a Bloom filter, but a PARAPHRASED eval example
  // shares no 20-gram with its train twin; the embedding-space check
  // catches what string matching cannot. For every eval vector: top-1
  // train cosine, mean of top-8, the Artetxe–Schwenk margin
  // (top1/mean-top8 — a scale-free signal that separates "genuinely
  // near" from "everything is equally far"), and the threshold flag.
  // Cosines round-8 per house rule (the TopKNbr aggregate applies the
  // exact round once per survivor); mean-top8 is a ≤8-term average →
  // rounded; margin one division of rounded values. The DuckDB oracle
  // replays the brute ranking window-style, hash-exact.
  val q203: QueryDef = QueryDef.sql(
    "q203_semantic_decontamination",
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |e AS (SELECT * FROM v WHERE vec_id % 50 = 0),
      |t AS (SELECT * FROM v WHERE vec_id % 50 != 0),
      |p AS (
      |  SELECT e.vec_id AS eval_id, t.vec_id AS train_id,
      |    round(list_sum(list_transform(range(1, 65),
      |        i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
      |          * CAST(t.embedding[CAST(i AS INT)] AS DOUBLE)))
      |      / (e.nrm * t.nrm), 8) AS c
      |  FROM e, t),
      |r AS (
      |  SELECT eval_id, train_id, c,
      |    row_number() OVER (PARTITION BY eval_id
      |      ORDER BY c DESC, train_id) AS rn
      |  FROM p)
      |SELECT eval_id,
      |  max(CASE WHEN rn = 1 THEN train_id END) AS train_id,
      |  max(CASE WHEN rn = 1 THEN c END) AS cos_top1,
      |  CAST(sum(CAST(round(c * 1e8) AS BIGINT)) AS DOUBLE)
      |    / (count(*) * 1e8) AS mean_top8,
      |  round(max(CASE WHEN rn = 1 THEN c END)
      |    / (CAST(sum(CAST(round(c * 1e8) AS BIGINT)) AS DOUBLE)
      |       / (count(*) * 1e8)), 6) AS margin,
      |  max(CASE WHEN rn = 1 THEN c END) >= 0.9 AS contaminated
      |FROM r WHERE rn <= 8
      |GROUP BY eval_id
      |ORDER BY eval_id""".stripMargin) { (s, d) =>
    semanticDecon(Tables.embeddings(s, d).select("vec_id", "embedding"))
  }

  // q204 — EXACT set-similarity self-join via prefix filtering (the
  // PPJoin/AllPairs family): 20-char-shingle Jaccard ≥ τ with a
  // DETERMINISTIC guarantee — the complement of the MinHash tier, whose
  // banding is probabilistic (q145 measures it biased high on this very
  // corpus). The classic prefix-filter lemma: order every doc's distinct
  // tokens by ascending global document frequency (rarest first); if
  // J(A,B) ≥ τ, then A and B must share a token among each one's first
  // |d| − ⌈τ·|d|⌉ + 1 tokens — so the RARE-token prefix is the blocking
  // key and candidates form only inside tiny df-ascending buckets (a
  // common token can never become a blocking key; it sits at the END of
  // the order). The token domain MUST be long shingles here, and the
  // choice is itself the operator's scale lesson: prefix filtering
  // blocks only where the token universe is large and Zipfian — this
  // corpus writes every doc from a 31-WORD vocabulary, so word tokens
  // (and even 5-grams: ~2k distinct) put half the corpus in every
  // bucket and the candidate set measured QUADRATIC (11.4M pairs at
  // sf0.1); 20-char shingles (q47's decontamination grain, ~1.1M
  // distinct at sf0.1) cut that to 258 — true near-dups only.
  // Verification is exact: the full lex-sorted gram arrays join in
  // AFTER pair generation keyed by doc_id (q41's payload discipline)
  // and |A∩B| is one fused two-pointer InterCount pass — integer out, so
  // J = inter/(|A|+|B|−inter) is a single IEEE division, rounded once
  // for the boundary filter both engines apply identically. Shuffles:
  // gram explode → df counts (map-side partials, O(vocab) out), the
  // doc_id re-group, the prefix-gram candidate join (bucket sizes
  // bounded by rarity), the pair-keyed verify join — no all-pairs
  // surface anywhere; hot-token skew lands on AQE's skew-split.
  // Spec: zero false negatives vs the brute-force O(n²) join at
  // sf0.001 (the lemma is a guarantee, not a recall target).
  val q204: QueryDef = QueryDef.sql(
    "q204_prefix_filter_join",
    """WITH tok AS (
      |  SELECT doc_id, g AS token
      |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
      |          range(1, length(text) - 18),
      |          i -> substr(text, CAST(i AS INT), 20)))) AS g
      |        FROM documents)),
      |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY token),
      |docs AS (
      |  SELECT tok.doc_id,
      |    list_sort(list(tok.token)) AS toks,
      |    list(tok.token ORDER BY df.df, tok.token) AS ord,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM tok JOIN df ON tok.token = df.token
      |  GROUP BY tok.doc_id),
      |pref AS (
      |  SELECT doc_id, unnest(list_slice(ord, 1,
      |    CAST(n - ceil(0.5 * n) + 1 AS BIGINT))) AS token
      |  FROM docs),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM pref a JOIN pref b ON a.token = b.token AND a.doc_id < b.doc_id),
      |ver AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
      |    a.n AS n_a, b.n AS n_b
      |  FROM cand c JOIN docs a ON c.id_a = a.doc_id JOIN docs b ON c.id_b = b.doc_id)
      |SELECT id_a, id_b, inter, n_a, n_b,
      |  round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 8) AS jaccard
      |FROM ver
      |WHERE round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 8) >= 0.5
      |ORDER BY jaccard DESC, id_a, id_b
      |LIMIT 100""".stripMargin) { (s, d) =>
    prefixFilterJoin(s, d, 0.5, takeN = 100)
  }

  /** q204's body with the threshold exposed (the spec replays it at
    * sf0.001 against the brute-force pair join to prove the lemma holds
    * end-to-end). Returns the top `takeN` pairs with shingle-Jaccard ≥
    * `tau`, ordered (jaccard desc, id_a, id_b). The per-doc gram-array
    * table fans out three ways (prefix branch + both verify sides) and
    * is deliberately RECOMPUTED per branch: persisting it was measured
    * SLOWER at sf1 (112 s vs 60 s solo — 50k rows × two ~300-string
    * arrays is a multi-GB cache whose build/GC costs more than three
    * runs of the columnar codegen pipeline). The wall time at sf1 is
    * output-proportional: the scale fixture plants 10-member near-dup
    * clusters, so ~225k true pairs flow through verification — the same
    * fixture-density class as q43/q109, noted in the scale audits.
    */
  private[graft] def prefixFilterJoin(s: SparkSession, d: String,
      tau: Double, takeN: Int): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.VectorExprs.charNgrams(col("text"), 20))).as("token"))
    val df = tok.groupBy("token").agg(count(lit(1)).as("df"))
    // per-doc artifacts off ONE doc_id re-group: the lex-sorted full set
    // (InterCount's input) and the df-ascending order the prefix slices
    val docsPlan = tok.join(df, "token")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("token"))).as("toks"),
        transform(array_sort(collect_list(struct(col("df"), col("token")))),
          x => x.getField("token")).as("ord"),
        count(lit(1)).as("n"))
      .withColumn("plen", (col("n") - ceil(lit(tau) * col("n")) + 1).cast("int"))
    val docs = docsPlan
    // prefix = first plen tokens of ord: posexplode keeps the rank
    val prefix = docs.select(col("doc_id"), col("plen"),
        posexplode(col("ord")).as(Seq("pos", "token")))
      .filter(col("pos") < col("plen"))
      .select("doc_id", "token")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val side = docs.select(col("doc_id"), col("toks"), col("n"))
    val out = cand
      .join(side.select(col("doc_id").as("id_a"), col("toks").as("t_a"),
        col("n").as("n_a")), "id_a")
      .join(side.select(col("doc_id").as("id_b"), col("toks").as("t_b"),
        col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExprs.interCountSorted(col("t_a"), col("t_b"))
          .cast("long").as("inter"),
        col("n_a"), col("n_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 8))
      .filter(col("jaccard") >= tau)
      .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
      .limit(takeN)
    out
  }

  /** Persisted prefix-filter index for EXACT-τ incremental dedup — q204's
    * q48 treatment. Three bucketed tables per corpus snapshot:
    *
    *  - `graft_pf_df_*` (token, df): the FROZEN token order. The prefix
    *    lemma holds under ANY fixed global total order — df-ascending is
    *    only the efficiency heuristic — so freezing the snapshot's order
    *    keeps later batches CONSISTENT with the stored prefixes without
    *    touching them (a batch token the snapshot never saw orders as
    *    df 0: rarest, which is also the efficient choice). Correctness
    *    never staleness-decays; only bucket selectivity does, and a
    *    periodic re-freeze is the amortized full rebuild.
    *  - `graft_pf_prefix_*` (doc_id, token) bucketed on token: the
    *    corpus docs' prefix tokens — the batch-vs-corpus candidate join
    *    reads these buckets IN PLACE (no corpus re-shuffle, ever).
    *  - `graft_pf_docs_*` (doc_id, toks, n) bucketed on doc_id: the
    *    verify-side artifacts, so exact |A∩B| needs no re-tokenization
    *    of corpus payloads. (q204's solo recompute-over-persist
    *    measurement doesn't apply here: that trade was per-query cache
    *    build vs three in-plan reuses — this is ONE disk write at
    *    snapshot build amortized over every later refresh, the
    *    signature-table economics of writeSignatureTable.)
    *
    * Prefix length is frozen at τ = 0.5 (q204's gate); any τ' ≥ 0.5
    * reuses the same index (longer thresholds need shorter prefixes —
    * monotone, so the stored prefix is a superset).
    */
  private val pfMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), (String, String, String)]()
  graft.Memos.register { () => pfMemo.clear() }
  private[graft] def prefixIndexTables(s: SparkSession,
      d: String): (String, String, String) =
    pfMemo.computeIfAbsent((s, d), { _ =>
      val suffix = graft.Memos.pathToken(d)
      val (dfT, prefT, docsT) = (s"graft_pf_df_$suffix",
        s"graft_pf_prefix_$suffix", s"graft_pf_docs_$suffix")
      val corpus = Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0)
      val tok = corpus.select(col("doc_id"),
        explode(array_distinct(
          graft.functions.VectorExprs.charNgrams(col("text"), 20))).as("token"))
      val dfTab = tok.groupBy("token").agg(count(lit(1)).as("df"))
      graft.operators.ScaleJoins.writeBucketed(dfTab, dfT, "token", 8)
      val docsArt = tok.join(s.table(dfT), "token")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("token"))).as("toks"),
          transform(array_sort(collect_list(struct(col("df"), col("token")))),
            x => x.getField("token")).as("ord"),
          count(lit(1)).as("n"))
        .withColumn("plen", (col("n") - ceil(lit(0.5) * col("n")) + 1).cast("int"))
      graft.operators.ScaleJoins.writeBucketed(
        docsArt.select("doc_id", "toks", "n"), docsT, "doc_id", 8)
      graft.operators.ScaleJoins.writeBucketed(
        docsArt.select(col("doc_id"), col("plen"),
            posexplode(col("ord")).as(Seq("pos", "token")))
          .filter(col("pos") < col("plen"))
          .select("doc_id", "token"),
        prefT, "token", 8)
      (dfT, prefT, docsT)
    })

  /** q217's body with the threshold and limit exposed (the spec replays
    * append-vs-rebuild equality without the LIMIT). Only the BATCH is
    * tokenized, df-ordered (under the frozen snapshot order via one
    * left join to the bucketed df table), prefixed, and joined —
    * the corpus contributes already-bucketed reads: O(batch) shuffle
    * work per refresh, the corpus never re-shuffles (plan-guarded).
    */
  private[graft] def incrementalPrefixJoin(s: SparkSession, d: String,
      tau: Double, takeN: Int): DataFrame = {
    val (dfT, prefT, docsT) = prefixIndexTables(s, d)
    val batchTok = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.VectorExprs.charNgrams(col("text"), 20))).as("token"))
    val bdocs = batchTok.join(s.table(dfT), Seq("token"), "left")
      .select(col("doc_id"), col("token"),
        coalesce(col("df"), lit(0L)).as("df"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("token"))).as("toks"),
        transform(array_sort(collect_list(struct(col("df"), col("token")))),
          x => x.getField("token")).as("ord"),
        count(lit(1)).as("n"))
      .withColumn("plen", (col("n") - ceil(lit(tau) * col("n")) + 1).cast("int"))
    val bprefix = bdocs.select(col("doc_id"), col("plen"),
        posexplode(col("ord")).as(Seq("pos", "token")))
      .filter(col("pos") < col("plen"))
      .select("doc_id", "token")
    // batch-vs-corpus: the corpus prefix buckets are read in place
    val cross = bprefix.as("b")
      .join(s.table(prefT).as("c"), col("b.token") === col("c.token"))
      .select(least(col("b.doc_id"), col("c.doc_id")).as("id_a"),
        greatest(col("b.doc_id"), col("c.doc_id")).as("id_b"))
    // batch-vs-batch: dups inside the arriving batch itself
    val self = bprefix.as("x").join(bprefix.as("y"),
        col("x.token") === col("y.token") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val cand = cross.union(self).distinct()
    // verify side: corpus artifacts come from the persisted bucketed doc
    // table and batch artifacts ride in-plan. A pair slot can hold either
    // kind of id, so each slot left-joins BOTH sources and coalesces —
    // NOT a union of the two artifact sets, which would drag the whole
    // corpus artifact table through the pair-join exchange (the O(corpus)
    // shuffle this operator exists to avoid; plan-guarded).
    val bArt = bdocs.select(col("doc_id"), col("toks"), col("n"))
    def attach(c: DataFrame, idCol: String, t: String, n: String): DataFrame =
      c.join(s.table(docsT).select(col("doc_id").as(idCol),
          col("toks").as("ct"), col("n").as("cn")), Seq(idCol), "left")
        .join(bArt.select(col("doc_id").as(idCol),
          col("toks").as("bt"), col("n").as("bn")), Seq(idCol), "left")
        .withColumn(t, coalesce(col("ct"), col("bt")))
        .withColumn(n, coalesce(col("cn"), col("bn")))
        .drop("ct", "cn", "bt", "bn")
    attach(attach(cand, "id_a", "t_a", "n_a"), "id_b", "t_b", "n_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExprs.interCountSorted(col("t_a"), col("t_b"))
          .cast("long").as("inter"),
        col("n_a"), col("n_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 8))
      .filter(col("jaccard") >= tau)
      .orderBy(desc("jaccard"), asc("id_a"), asc("id_b"))
      .limit(takeN)
  }

  // q217 — INCREMENTAL prefix-filter dedup: q204's exact-Jaccard release
  // gate with q48's refresh economics. q48 serves the approximate MinHash
  // tier incrementally; gates that need a DETERMINISTIC τ guarantee
  // (q204's reason to exist) previously paid a full corpus rebuild per
  // arriving batch. Here the corpus snapshot keeps three persisted
  // bucketed tables (frozen df order, prefix tokens on token, verify
  // artifacts on doc_id — see prefixIndexTables); a batch refresh
  // tokenizes and prefixes ONLY the batch under the frozen order and
  // joins corpus buckets in place — O(batch) shuffle, corpus never
  // re-shuffled (plan-guarded). The frozen order changes candidate SETS
  // vs a fresh rebuild but never the verified OUTPUT (the lemma holds
  // under any consistent total order and verification is exact) — the
  // spec asserts append == rebuild pair-for-pair; the oracle replays the
  // frozen-order semantics end-to-end. Output: every ≥ τ pair involving
  // a batch doc (batch-corpus and batch-batch).
  val q217: QueryDef = QueryDef.sql(
    "q217_incremental_prefix_dedup",
    """WITH tokall AS (
      |  SELECT doc_id, g AS token
      |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
      |          range(1, length(text) - 18),
      |          i -> substr(text, CAST(i AS INT), 20)))) AS g
      |        FROM documents)),
      |ctok AS (SELECT * FROM tokall WHERE doc_id % 10 != 0),
      |btok AS (SELECT * FROM tokall WHERE doc_id % 10 = 0),
      |cdf AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM ctok GROUP BY token),
      |cdocs AS (
      |  SELECT ctok.doc_id,
      |    list_sort(list(ctok.token)) AS toks,
      |    list(ctok.token ORDER BY cdf.df, ctok.token) AS ord,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM ctok JOIN cdf ON ctok.token = cdf.token
      |  GROUP BY ctok.doc_id),
      |bdocs AS (
      |  SELECT btok.doc_id,
      |    list_sort(list(btok.token)) AS toks,
      |    list(btok.token ORDER BY coalesce(cdf.df, 0), btok.token) AS ord,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM btok LEFT JOIN cdf ON btok.token = cdf.token
      |  GROUP BY btok.doc_id),
      |cpref AS (
      |  SELECT doc_id, unnest(list_slice(ord, 1,
      |    CAST(n - ceil(0.5 * n) + 1 AS BIGINT))) AS token
      |  FROM cdocs),
      |bpref AS (
      |  SELECT doc_id, unnest(list_slice(ord, 1,
      |    CAST(n - ceil(0.5 * n) + 1 AS BIGINT))) AS token
      |  FROM bdocs),
      |cand AS (
      |  SELECT least(b.doc_id, c.doc_id) AS id_a,
      |    greatest(b.doc_id, c.doc_id) AS id_b
      |  FROM bpref b JOIN cpref c ON b.token = c.token
      |  UNION
      |  SELECT x.doc_id, y.doc_id
      |  FROM bpref x JOIN bpref y ON x.token = y.token AND x.doc_id < y.doc_id),
      |alldocs AS (
      |  SELECT doc_id, toks, n FROM cdocs
      |  UNION ALL SELECT doc_id, toks, n FROM bdocs),
      |ver AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
      |    a.n AS n_a, b.n AS n_b
      |  FROM cand c JOIN alldocs a ON c.id_a = a.doc_id
      |    JOIN alldocs b ON c.id_b = b.doc_id)
      |SELECT id_a, id_b, inter, n_a, n_b,
      |  round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 8) AS jaccard
      |FROM ver
      |WHERE round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 8) >= 0.5
      |ORDER BY jaccard DESC, id_a, id_b
      |LIMIT 100""".stripMargin) { (s, d) =>
    incrementalPrefixJoin(s, d, 0.5, takeN = 100)
  }

  val all: Seq[QueryDef] = Seq(q40, q41, q42, q43, q44, q45, q46, q47, q48,
    q49, q75, q99, q109, q115, q117, q122, q125, q128, q131, q132, q138,
    q145, q154, q203, q204, q217)
}
