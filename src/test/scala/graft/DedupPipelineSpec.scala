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

  test("q203 semantic decontamination flags a planted eval/train duplicate") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 100 deterministic pseudo-random unit-ish vectors; eval ids are the
    // %50==0 slice (0, 50). Plant: eval 50 IS train 7's embedding — a
    // paraphrase-free identical twin the string decontaminators would
    // also catch, standing in for the semantic near-twin they cannot.
    def vec(seed: Long): Array[Float] = Array.tabulate(64) { i =>
      var z = (seed * 64 + i) * 0x9E3779B97F4A7C15L
      z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
      z ^= z >>> 27; z *= 0x94D049BB133111EBL
      z ^= z >>> 31
      ((z & 0xFFFFF).toFloat / 0x100000) - 0.5f
    }
    val rows = (0 until 100).map { id =>
      val e = if (id == 50) vec(7) else vec(id)
      Row(id.toLong, e.toSeq)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val v = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val out = Dedup.semanticDecon(v).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getBoolean(5))).toMap
    // the planted twin: top-1 is train 7 at cosine 1.0, flagged
    assert(out(50L)._1 == 7L, s"expected train 7 as top-1, got ${out(50L)}")
    assert(out(50L)._2 == 1.0, s"expected cosine 1.0, got ${out(50L)._2}")
    assert(out(50L)._3, "planted duplicate must be flagged contaminated")
    // the clean eval vector: nothing near, not flagged
    assert(!out(0L)._3, s"clean eval must not be flagged: ${out(0L)}")
    assert(out(0L)._2 < 0.9)
  }
}
