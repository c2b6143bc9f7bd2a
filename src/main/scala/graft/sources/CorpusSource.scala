package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines corpus ingest/egress — the interchange format of large-scale
  * text-pipeline corpora (one JSON document per line; splittable when
  * uncompressed or block-compressed, so the scan parallelizes across
  * executors like any file source).
  *
  * Design points for 100 TB corpora:
  *  - ALWAYS read with an explicit schema: schema inference is a full
  *    extra pass over the data.
  *  - PERMISSIVE parse with a captured `_corrupt_record` column: a bad
  *    line quarantines as a row instead of failing the job; `quarantine`
  *    splits clean/dirty in one pass.
  *  - Writes partition by `lang`: downstream per-language reads (langid
  *    audits, per-lang dedup) prune partitions at the file listing — the
  *    plan's PartitionFilters, not a post-scan filter.
  */
object CorpusSource {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  /** Read a JSONL corpus with the fixed schema; malformed lines survive as
    * rows with only `_corrupt_record` set.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Split a permissively-read corpus into (clean, quarantined) —
    * quarantined rows keep the raw line for replay/repair.
    *
    * The parsed input is cached first: Spark disallows raw-file scans
    * whose referenced columns reduce to ONLY the internal corrupt-record
    * column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    * materializing the parse once is the documented pattern — it also
    * means the corpus is parsed one time for both sides of the split.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    val clean = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val dirty = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, dirty)
  }

  /** Write a documents table as a lang-partitioned JSONL corpus. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("lang").json(path)

  /** Read back one language partition — the path prunes at file listing. */
  def readLang(spark: SparkSession, path: String, lang: String): DataFrame =
    readJsonl(spark, path).filter(col("lang") === lang)

  /** STREAMING corpus ingestion: the same explicit-schema PERMISSIVE
    * parse as [[readJsonl]], but as a file-source stream — new JSONL
    * files dropped into `path` arrive as micro-batches, corrupt lines
    * included as quarantine rows (a bad line must never kill a standing
    * ingest). `maxFilesPerTrigger` bounds each batch so a backlog drains
    * at a controlled rate instead of one giant first batch. Compose with
    * [[graft.text.TextAnalysis.curationStream]] /
    * [[graft.dedup.Dedup.streamDupFlags]] for the full arriving-corpus
    * pipeline (FileStreamSpec proves the parse + quarantine behavior).
    */
  def streamJsonl(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
}
