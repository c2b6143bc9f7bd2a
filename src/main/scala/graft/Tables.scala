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
  /** `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark only
    * reads as a raw nano count under the legacy flag. Normalize here to a
    * microsecond timestamp `ts` (matching DuckDB's native truncation) plus
    * an exact `ts_us` bigint for epoch arithmetic, so query code stays
    * idiomatic and engine-comparable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
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
