package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.CorpusSource

class CorpusSourceSpec extends SparkSpec {

  test("JSONL roundtrip preserves the documents table; partition pruning by lang") {
    val dir = Files.createTempDirectory("corpus").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "source", "text")
    CorpusSource.writeJsonl(docs, dir)

    val back = CorpusSource.readJsonl(spark, dir)
    val (clean, dirty) = CorpusSource.quarantine(back)
    assert(clean.count() == docs.count())
    assert(dirty.count() == 0)
    // full content equality on rejoin
    val mismatch = clean.select("doc_id", "lang", "text")
      .exceptAll(docs.select("doc_id", "lang", "text")).count()
    assert(mismatch == 0)

    // per-lang read prunes partitions at the scan (PartitionFilters in plan)
    val one = CorpusSource.readLang(spark, dir, "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"lang filter should prune partitions:\n$plan")
    assert(one.count() > 0)
    assert(one.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }

  test("malformed lines quarantine instead of failing the read") {
    val dir = Files.createTempDirectory("corpus_bad").toFile
    val f = new java.io.File(dir, "part-000.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "lang": "en", "source": "s", "text": "good line"}""")
    w.println("""{"doc_id": broken json,,,""")
    w.println("""{"doc_id": 2, "lang": "de", "source": "s", "text": "also good"}""")
    w.close()

    val (clean, dirty) = CorpusSource.quarantine(
      CorpusSource.readJsonl(spark, dir.toString))
    assert(clean.count() == 2)
    assert(dirty.count() == 1)
    assert(dirty.head.getString(0).contains("broken json"))
  }

  test("writeTrainingShards: one sorted file per shard, token mass balanced, no doc lost") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_shards").toString
    graft.text.TextAnalysis.writeTrainingShards(spark, sfDir, out)

    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 8, s"expected 8 shard dirs, got ${shardDirs.length}")

    // every document lands exactly once
    val back = spark.read.parquet(out)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(back.count() == nDocs)
    assert(back.select("doc_id").distinct().count() == nDocs)

    // token mass balance across shards (the doc_id round-robin's doing)
    val masses = back.groupBy("shard").agg(sum("n_tok").as("m"))
      .collect().map(_.getAs[Long]("m"))
    val mean = masses.sum.toDouble / masses.length
    masses.foreach(m =>
      assert(math.abs(m - mean) / mean < 0.2, s"shard mass $m vs mean $mean"))

    // each shard: ONE file whose physical row order is the packed
    // stream — (pack_id, pack_offset) monotonic when read back alone
    shardDirs.foreach { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${dir.getName}: expected 1 file, got ${files.length}")
      val rows = spark.read.parquet(files.head.getPath)
        .select("pack_id", "pack_offset").collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      assert(rows.zip(rows.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) },
        s"${dir.getName}: rows not in packed-stream order")
    }
  }

  test("shardManifest: published digest verifies clean, flags a corrupted shard") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_shards_m").toString
    graft.text.TextAnalysis.writeTrainingShards(spark, sfDir, out)
    val manifest = graft.text.TextAnalysis.shardManifest(spark, out)
    val rows = manifest.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sfDir).count())
    // bit-identical artifact → verification is empty
    assert(graft.text.TextAnalysis.verifyShardManifest(spark, out, manifest)
      .isEmpty, "clean artifact must verify")
    // deterministic: a fresh manifest over the same files is identical
    val again = graft.text.TextAnalysis.shardManifest(spark, out).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
    // corrupt ONE shard in a copy (drop its first row) → exactly that
    // shard fails, the other seven still verify
    val published = manifest.collect()
    val corrupted = Files.createTempDirectory("graft_shards_c").toString
    val back = spark.read.parquet(out)
    val victim = back.filter(col("shard") === 3)
      .orderBy("pack_id", "pack_offset").limit(1)
      .select("doc_id").collect().head.getLong(0)
    back.filter(!(col("shard") === 3 && col("doc_id") === victim))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "pack_id", "pack_offset")
      .write.mode("overwrite").partitionBy("shard").parquet(corrupted)
    val pubDf = spark.createDataFrame(
      spark.sparkContext.parallelize(published.toSeq), manifest.schema)
    val bad = graft.text.TextAnalysis.verifyShardManifest(spark, corrupted, pubDf)
      .collect().map(_.getAs[Int]("shard"))
    assert(bad.toSeq == Seq(3), s"expected only shard 3 to fail, got ${bad.toSeq}")
  }
}
