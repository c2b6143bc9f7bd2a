package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational
import graft.ml.{GanQueries, MlPrep}
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.multimodal.Binary
import graft.streaming.Events

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's operator catalog: each module contributes `QueryDef`s
  * (Spark implementation + optional DuckDB oracle SQL); this object is the
  * flat registry the driver executes.
  */
object SparkEntry {

  def catalog: Seq[QueryDef] =
    Relational.all ++ MlPrep.all ++ GanQueries.all ++ TextAnalysis.all ++
      Dedup.all ++ Similarity.all ++ Binary.all ++ Events.all ++
      graft.graph.Graph.all ++ graft.operators.Incremental.all ++
      graft.ml.Whitening.all ++ graft.ml.Probe.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalog.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
