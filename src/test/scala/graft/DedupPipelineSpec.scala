package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The persisted-signature dedup pipeline: signatures computed once,
  * candidate joins exchange-free over co-located buckets.
  */
class DedupPipelineSpec extends SparkSpec {

  test("bucketed signature self-join is exchange-free and pair-complete") {
    Dedup.writeSignatureTable(spark, sfDir, "sig_corpus", buckets = 4)
    // the test table is tiny, so the planner would pick a broadcast join;
    // disable it to surface the bucketed SMJ a corpus-scale table gets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cand = Dedup.bucketedCandidates(spark, "sig_corpus", "sig_corpus")
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed signature join must not re-shuffle:\n$plan")

      // same candidate pair set as the unbucketed banded self-join
      val banded = Dedup.bandedSignatures(Tables.documents(spark, sfDir))
      val a = banded.select(col("band").as("band_a"), col("key").as("key_a"),
        col("doc_id").as("id_a"))
      val b = banded.select(col("band").as("band_b"), col("key").as("key_b"),
        col("doc_id").as("id_b"))
      val plain = a.join(b, col("band_a") === col("band_b") &&
          col("key_a") === col("key_b") && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val bucketedSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plainSet = plain.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketedSet == plainSet)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS sig_corpus")
    }
  }

  test("q48 incremental batch-vs-corpus join reads co-located buckets, no shuffle") {
    val (corpusT, batchT) = Dedup.incrementalSigTables(spark, sfDir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table(batchT).as("b")
        .join(spark.table(corpusT).as("c"), col("b.bkey") === col("c.bkey"))
        .select(col("b.doc_id"), col("c.doc_id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      assert(!plan.contains("Exchange"),
        s"incremental candidate join must not re-shuffle the corpus:\n$plan")
      // the refresh decision itself runs and covers every batch doc
      val out = Dedup.q48.fn(spark, sfDir)
      val batchDocs = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 10 === 0).count()
      assert(out.count() == batchDocs)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
