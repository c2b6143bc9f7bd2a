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
}
