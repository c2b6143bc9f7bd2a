package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes that break at 100 TB.
  *
  * - [[saltedJoin]]: when one join key is hot (a power-law key holding a
  *   double-digit share of rows), a plain shuffle join sends the whole hot
  *   key to one reducer. Salting splits each big-side key into `salt`
  *   sub-keys and replicates the small side per sub-key — the classic
  *   manual remedy when AQE's skew-join split isn't available (e.g. the
  *   skew is in a broadcast-too-big dimension).
  * - [[writeBucketed]]/co-located reads: pre-bucketing both fact tables on
  *   the join key lets Spark plan a SortMergeJoin with NO Exchange — at
  *   cluster scale that's the difference between re-shuffling 100 TB per
  *   query and reading co-located buckets.
  */
object ScaleJoins {

  /** Skew-resistant equi-join: salt the big side's key space `salt` ways,
    * replicate the small side across all salt values, join on
    * (key, salt). Result equals `big.join(small, keys, "inner")`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val replicated = small.crossJoin(
      small.sparkSession.range(salt).select(col("id").cast("int").as("_salt")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Write `df` as a bucketed, sorted table (saved to the session catalog)
    * so subsequent equi-joins on `key` are exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      // external path under the session's OWN warehouse dir — survives a
      // stale catalog (files outlive the per-JVM metastore) and two
      // sessions with different warehouses never clobber each other
      .option("path",
        s"${df.sparkSession.sessionState.conf.warehousePath}/graft-bucketed/$table")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on `key` — plans without a
    * shuffle Exchange on either side.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession, tableA: String,
      tableB: String, key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
