package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.SnapshotTable

/** SnapshotTable wired into the incremental-dedup flow (q48's shape): a
  * long-running dedup job pins ONE corpus version at job start and keeps
  * reading it while ingestion appends — and survives a later compaction +
  * expiry because refcounting keeps any file its pinned version shares
  * with a retained one. This is the "hours-long dedup under live
  * ingestion" contract at 100 TB: the dedup pass must never see a corpus
  * that changes between its first scan and its last.
  */
class SnapshotDedupSpec extends SparkSpec {

  /** Batch docs whose MinHash bands collide with `corpus` — the dedup
    * decision input (one flag row set per run, keep = no collision).
    */
  private def dupFlags(batch: DataFrame, corpus: DataFrame): Set[Long] = {
    val bs = Dedup.bandedSignatures(batch).select(col("doc_id"), col("band"), col("key"))
    val cs = Dedup.bandedSignatures(corpus)
      .select(col("doc_id").as("corpus_doc_id"), col("band"), col("key"))
    bs.join(cs, Seq("band", "key"))
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("dedup job pinned to a snapshot is isolated from appends and survives expiry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-dedup")
      .toString + "/corpus"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus0 = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)

    val v0 = SnapshotTable.commit(spark, dir, corpus0)
    // the dedup job resolves its corpus version ONCE, up front
    val pinned = SnapshotTable.read(spark, dir, v0)
    val flagsBefore = dupFlags(batch, pinned)

    // ingestion lands mid-job: clones of the batch docs (same text, new
    // ids) — rows that WOULD collide with every batch doc if visible
    val clones = batch.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val v1 = SnapshotTable.append(spark, dir, clones)
    assert(v1 == v0 + 1)

    // the pinned plan re-evaluates to the SAME decision — the append is
    // invisible to a reader that resolved v0's manifest
    assert(dupFlags(batch, pinned) == flagsBefore,
      "append leaked into a pinned snapshot read")
    assert(pinned.count() == corpus0.count())

    // an UNpinned (HEAD) reader does see the clones: every batch doc now
    // collides — the isolation above is the pin, not insensitivity
    val flagsHead = dupFlags(batch, SnapshotTable.read(spark, dir))
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchIds.subsetOf(flagsHead))
    assert(SnapshotTable.rowCount(spark, dir) == corpus0.count() + batch.count())

    // retention: a second append then expiry of v0's MANIFEST — v0's data
    // files are part of v1/v2's lineage, so refcounting keeps them and
    // the still-running pinned job keeps working
    SnapshotTable.append(spark, dir,
      batch.select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    SnapshotTable.expire(spark, dir, keepLast = 2)
    assertThrows[IllegalArgumentException](SnapshotTable.snapshot(spark, dir, v0))
    assert(pinned.count() == corpus0.count(),
      "expiry deleted files still referenced by retained versions")
    assert(dupFlags(batch, pinned) == flagsBefore)
  }
}
