package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // dev-only: extra args select a subset of queries to dump
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // see Bench.scala: keep large-group object aggregates hash-based.
      // Both knobs scale with the corpus (env-overridable for scale
      // checkpoints): group counts grow with data, so a fixed fallback
      // threshold silently flips the pair-aggregation family to
      // sort-based at 100x; and split size must let row groups of the
      // checkpoint corpus fan out across cores.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK", "4096"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      // see Bench.scala: bound cross-query shuffle-file retention on
      // long sessions (big-SF full-catalog dumps spill tens of GB).
      // 5min, not 30min — 30min IS Spark's default, so it wouldn't fix
      // the spill accumulation it's here to fix.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "5min"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a query that fails before dumping must leave an explicit artifact —
    // the r7 round shipped with 18 broken queries silently ABSENT from
    // CORRECTNESS (no dump → no row), which no pass-count diff could flag
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // rows-only queries (no DuckDB oracle) get their invariant checks run
    // HERE, on the same freshly-computed result the dump writes, so every
    // catalog id carries an explicit machine-readable pass/fail in round
    // artifacts (oracle ids via the driver's DuckDB compare, rows-only
    // ids via rows_only_checks.json) — see RowsOnlyChecks.
    val oracleIds = SparkEntry.oracleSql.keySet
    val roChecks = scala.collection.mutable.LinkedHashMap[String, (String, String, Seq[String])]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name))
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        if (!oracleIds(name)) RowsOnlyChecks.checks.get(name) match {
          case Some(c) =>
            val fails = try c.run(spark, sfDir, df)
              catch { case e: Throwable =>
                Seq(s"check threw ${e.getClass.getSimpleName}: " +
                  Option(e.getMessage).map(_.linesIterator.next().take(200)).getOrElse("")) }
            roChecks(name) = (c.spec, c.invariant, fails)
          case None =>
            roChecks(name) = ("", "NO CHECK REGISTERED",
              Seq("rows-only query without a RowsOnlyChecks entry"))
        }
      }
      catch { case e: Throwable =>
        errors(name) = e.getClass.getSimpleName +
          Option(e.getMessage).map(m => ": " + m.linesIterator.next().take(200))
            .getOrElse("")
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // errors.json: one entry per failed query (empty object on a clean
    // pass), so a red query surfaces as a diffable artifact even though
    // the successful dumps are still written and compared. Exit stays 0:
    // partial correctness data beats none if the driver bails on rc != 0.
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // rows_only_checks.json: {query: {pass, spec, invariant, failures}}.
    // A filtered dev run (query-name args) must not clobber the full
    // manifest a prior full run wrote into the same outDir — it only
    // rewrites when it covers at least the ids already on disk, so the
    // driver's artifact is always the widest manifest produced there.
    val roPath = Paths.get(s"$outDir/rows_only_checks.json")
    val priorIds: Set[String] =
      if (only.nonEmpty && Files.exists(roPath))
        "\"(q\\d+[a-z0-9_]*)\"\\s*:\\s*\\{".r
          .findAllMatchIn(Files.readString(roPath)).map(_.group(1)).toSet
      else Set.empty
    if ((priorIds -- roChecks.keySet).isEmpty)
      Files.writeString(roPath,
        roChecks.map { case (k, (spec, inv, fails)) =>
          s"${q(k)}: {${q("pass")}: ${fails.isEmpty}, ${q("spec")}: ${q(spec)}, " +
            s"${q("invariant")}: ${q(inv)}, ${q("failures")}: " +
            fails.map(q).mkString("[", ",", "]") + "}"
        }.mkString("{", ",", "}"))
    else
      System.err.println(s"[verify] filtered run: keeping the existing " +
        s"${priorIds.size}-id rows_only_checks.json (this run checked " +
        s"${roChecks.size})")
    val roFail = roChecks.collect { case (k, (_, _, f)) if f.nonEmpty => k }
    if (roFail.nonEmpty)
      System.err.println(s"[verify] ${roFail.size} ROWS-ONLY CHECKS FAILED: " +
        roFail.mkString(", "))
    else if (roChecks.nonEmpty)
      System.err.println(s"[verify] ${roChecks.size} rows-only checks passed")
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} QUERIES FAILED: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
