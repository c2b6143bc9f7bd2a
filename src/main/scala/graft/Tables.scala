package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the TPC-H-ish test schema.
  *
  * Mirrors the ingest surface of the reference
  * (Java/src/main/java/org/deeplearning4j/dl4jGANComputerVision.java:372-400
  * reads CSV matrices), re-expressed as Spark parquet scans so filters and
  * projections push down to the columnar reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  /** `events.ts` has shipped under two parquet encodings: plain
    * timestamp[us] (isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ) and
    * legacy TIMESTAMP(NANOS) (Spark only reads it as a raw nano count under
    * `spark.sql.legacy.parquet.nanosAsLong`). Branch on the LOADED dtype and
    * normalize both to the same pair: a session-zoned microsecond timestamp
    * `ts` plus an exact `ts_us` bigint for epoch arithmetic — so the 18
    * downstream consumers are encoding-agnostic. Sessions pin
    * `spark.sql.session.timeZone=UTC`, making the NTZ→LTZ cast an identity
    * on the stored micros (the value DuckDB's naive TIMESTAMP sees).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw =
      try load(s, d, "events")
      catch {
        // TIMESTAMP(NANOS) files fail schema conversion without the legacy
        // flag; only then opt in (scoped intent — never mutated for modern
        // files) and re-read, yielding `ts` as a raw nanos long.
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Parquet") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long
        raw
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _: TimestampNTZType =>
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
      case _: TimestampType =>
        raw.withColumn("ts_us", unix_micros(col("ts")))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other (expected timestamp or legacy nanos long)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Memoized `embeddings` row count per (session, corpus dir) — one
    * metadata-cheap action shared by every consumer that sizes a
    * structure from n (the blocking quantizer's √n cell count, q52's
    * grid-chunk count). At cluster scale this is the value a catalog
    * statistic would provide; the memo is the local stand-in.
    */
  private val embCountMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()
  Memos.register { () => embCountMemo.clear() }
  def embeddingsCount(s: SparkSession, d: String): Long =
    embCountMemo.computeIfAbsent((s, d),
      { _ => java.lang.Long.valueOf(embeddings(s, d).count()) }).longValue()

  /** Memoized `documents` row count — same catalog-statistic stand-in as
    * [[embeddingsCount]], shared by the corpus-size gates that pick a
    * plan (q204's factored path) or a storage level (the shingle dict)
    * by corpus regime.
    */
  private val docCountMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()
  Memos.register { () => docCountMemo.clear() }
  def documentsCount(s: SparkSession, d: String): Long =
    docCountMemo.computeIfAbsent((s, d),
      { _ => java.lang.Long.valueOf(documents(s, d).count()) }).longValue()

  /** Scan-width fan-out for LONG per-row CPU kernels over an unsplit
    * input (guide §2.5's unsplittable-input rule: "repartition
    * immediately after the read"). Fires only when BOTH
    *   (a) `rows >= gateRows` — the serial kernel would run long enough
    *       that one round-robin exchange of skinny rows is noise against
    *       it (measured at sf0.1: fanning out ~0.5 s kernels multiplied
    *       total task time ~20× in per-task overhead + GC churn and made
    *       wall WORSE — small kernels must stay fused with the scan), and
    *   (b) the frame's scan yields fewer splits than the cluster's
    *       parallelism (at 100 TB the file set out-splits the cluster, so
    *       this is the identity — no corpus exchange is ever added where
    *       data already fans out; the r13 measurement that rejected
    *       unconditional post-scan repartitions).
    * Callers pass `rows` from a memoized catalog-statistic count
    * ([[embeddingsCount]]/[[documentsCount]]).
    *
    * Only order-free consumers may use this (integer/exact aggregates,
    * bounded top-k aggregates, per-row math): repartitioning reorders
    * rows, which would perturb last-ulp sums in cross-row double
    * aggregates.
    */
  def fanOutWide(df: DataFrame, rows: Long, gateRows: Long = 65536L): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (rows >= gateRows && df.rdd.getNumPartitions < p) df.repartition(p)
    else df
  }
}

/** Registry for the engine's session-lifetime memo caches (cached
  * signature DataFrames, trained quantizers, persisted index tables).
  *
  * The memos assume a STATIC corpus per (session, dir) — the right trade
  * for batch pipelines where one snapshot is queried many times. A
  * long-lived session that rewrites a corpus dir, or needs to bound
  * cached-plan/storage memory, calls [[clearAll]]: every registered memo
  * unpersists its cached DataFrames and forgets its state, so the next
  * query rebuilds from the current files. Storage-memory pressure from
  * the memos is visible in the bench harness' `storage_mem_high_water`
  * field.
  */
object Memos {
  private val clearers =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Called once per memo site at class-init; `f` drops that memo's state
    * (unpersisting any cached DataFrames it holds).
    */
  def register(f: () => Unit): Unit = clearers.add(f)

  /** Drop every registered memo: cached plans unpersist, trained models
    * and table registrations forget. Persisted table FILES under the
    * warehouse dir survive (they are corpus-snapshot artifacts); their
    * next use rebuilds the catalog entry via overwrite.
    */
  def clearAll(): Unit = clearers.forEach(f => f())

  /** Collision-free table-name token for a corpus dir: the first 16 hex
    * chars of SHA-256 over the CANONICAL path (a 32-bit `hashCode` can
    * collide across two dirs within one session and silently share a
    * persisted table).
    */
  def pathToken(d: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(new java.io.File(d).getCanonicalPath.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  }
}

/** One engine operator: a Spark implementation plus (when SQL-expressible)
  * an ANSI-SQL oracle the driver replays in DuckDB over the same parquet.
  * Oracle-bearing results must be deterministic: unique sort keys, and any
  * multi-term double aggregate rounded (per-row single IEEE ops are exact
  * across engines and stay unrounded).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
