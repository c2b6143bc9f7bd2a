package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The snapshot table's transactional claims, each exercised through a
  * concrete failure or concurrency scenario — not just happy-path
  * roundtrips.
  */
class SnapshotTableSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")

  test("commit/read roundtrip and metadata row count without data reads") {
    val dir = Files.createTempDirectory("snap_rt").toString
    val v = SnapshotTable.commit(spark, dir, docs)
    assert(v == 0)
    assert(SnapshotTable.read(spark, dir).count() == docs.count())
    assert(SnapshotTable.rowCount(spark, dir) == docs.count())
  }

  test("append creates a new version; readers pinned to the old one are isolated") {
    val dir = Files.createTempDirectory("snap_iso").toString
    val first = docs.filter(col("doc_id") < 50)
    val more = docs.filter(col("doc_id") >= 50 && col("doc_id") < 80)
    val v0 = SnapshotTable.commit(spark, dir, first)
    val v1 = SnapshotTable.append(spark, dir, more)
    assert(v0 == 0 && v1 == 1)
    // time travel: v0 still reads exactly its original contents
    assert(SnapshotTable.read(spark, dir, v0).count() == 50)
    assert(SnapshotTable.read(spark, dir).count() == 80)
    // append reuses the parent's files untouched (O(new data) write cost)
    val f0 = SnapshotTable.snapshot(spark, dir, v0).files.toSet
    val f1 = SnapshotTable.snapshot(spark, dir, v1).files.toSet
    assert(f0.subsetOf(f1) && f1.size > f0.size)
  }

  test("a crashed writer's stray data files are invisible to readers") {
    val dir = Files.createTempDirectory("snap_torn").toString
    SnapshotTable.commit(spark, dir, docs.filter(col("doc_id") < 30))
    // simulate a torn commit: data files land but no manifest ever names
    // them (the writer died between step 1 and step 2)
    docs.filter(col("doc_id") >= 30).write.parquet(s"$dir/data/dead-writer-uuid")
    assert(SnapshotTable.read(spark, dir).count() == 30)
    // and the table remains appendable afterwards
    SnapshotTable.append(spark, dir, docs.filter(col("doc_id") === 999999))
    assert(SnapshotTable.read(spark, dir).count() == 30)
  }

  test("compact preserves contents exactly and reduces the file count") {
    val dir = Files.createTempDirectory("snap_comp").toString
    // several appends -> many small files
    (0 until 4).foreach { i =>
      SnapshotTable.append(spark, dir,
        docs.filter(col("doc_id") % 4 === i).repartition(3))
    }
    val before = SnapshotTable.read(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    val nFilesBefore = SnapshotTable.snapshot(spark, dir,
      SnapshotTable.currentVersion(spark, dir)).files.size
    val vc = SnapshotTable.compact(spark, dir, 1)
    val after = SnapshotTable.read(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(after == before)
    assert(SnapshotTable.snapshot(spark, dir, vc).files.size == 1)
    assert(nFilesBefore > 1)
  }

  test("expire drops only unreferenced files; retained versions still read") {
    val dir = Files.createTempDirectory("snap_exp").toString
    SnapshotTable.commit(spark, dir, docs.filter(col("doc_id") < 20))   // v0
    SnapshotTable.append(spark, dir,
      docs.filter(col("doc_id") >= 20 && col("doc_id") < 40))           // v1
    SnapshotTable.commit(spark, dir, docs.filter(col("doc_id") < 10))   // v2 (rewrite)
    SnapshotTable.append(spark, dir,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 45))           // v3
    SnapshotTable.expire(spark, dir, keepLast = 2)                      // keep v2, v3
    // retained versions read fine, incl. the shared-prefix append lineage
    assert(SnapshotTable.read(spark, dir, 2).count() == 10)
    assert(SnapshotTable.read(spark, dir, 3).count() == 15)
    // expired manifests are gone
    intercept[IllegalArgumentException] { SnapshotTable.snapshot(spark, dir, 0) }
    intercept[IllegalArgumentException] { SnapshotTable.snapshot(spark, dir, 1) }
    // v0/v1's exclusive files were physically deleted (v2 rewrote, so
    // nothing of v0/v1 survives in the live set)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = (2 to 3).flatMap(v => SnapshotTable.snapshot(spark, dir, v).files).toSet
    val onDisk = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data")).toSeq
      .flatMap(d => f.listStatus(d.getPath).toSeq)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(st => s"data/${st.getPath.getParent.getName}/${st.getPath.getName}").toSet
    assert(onDisk == live)
  }

  test("a dedup pass over a pinned snapshot is stable under concurrent appends") {
    val dir = Files.createTempDirectory("snap_pin").toString
    SnapshotTable.commit(spark, dir, docs.filter(col("doc_id") < 100))
    val pinned = SnapshotTable.currentVersion(spark, dir)
    val snapshotDf = SnapshotTable.read(spark, dir, pinned)
    val before = snapshotDf.select(sum(length(col("text")))).head.getLong(0)
    // ingestion keeps committing while the long job is mid-flight
    SnapshotTable.append(spark, dir, docs.filter(col("doc_id") >= 100))
    // the pinned frame re-evaluates to the SAME bytes — manifest-listed
    // files only, so the append cannot leak into a second action
    assert(snapshotDf.select(sum(length(col("text")))).head.getLong(0) == before)
    assert(snapshotDf.count() == 100)
    assert(SnapshotTable.read(spark, dir).count() == docs.count())
  }
}
