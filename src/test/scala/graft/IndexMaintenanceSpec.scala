package graft

import org.apache.spark.sql.functions._

/** Incremental maintenance of the persisted compressed ANN index:
  * appending a batch must (a) touch only the batch's cell partitions and
  * (b) leave probes indistinguishable from a one-shot build over the
  * union — the O(batch)-per-refresh posture q48 established for dedup,
  * applied to the vector store.
  */
class IndexMaintenanceSpec extends SparkSpec {

  test("appendToIndexTable == one-shot build over the union; old partitions untouched") {
    val t = "graft_test_incr_idx"
    sim.Similarity.writeIndexTable(spark, sfDir, t)
    val before = spark.table(t).count()

    // snapshot the files of every pre-existing cell partition
    val root = new java.io.File(
      spark.sessionState.conf.warehousePath.stripPrefix("file:"),
      s"graft-annindex/$t")
    def partFiles(): Map[String, Set[String]] =
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val filesBefore = partFiles()

    // the "new batch": 40 fresh vectors (cloned embeddings, shifted ids)
    val batch = Tables.embeddings(spark, sfDir)
      .orderBy("vec_id").limit(40)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    sim.Similarity.appendToIndexTable(spark, sfDir, t, batch)

    assert(spark.table(t).count() == before + 40, "append must add exactly the batch")

    // (a) partitions not hit by the batch kept their exact files
    val batchCells = sim.Similarity.encodeVectors(batch,
        ml.Centroids.centers(spark, sfDir), ml.Centroids.pqCodebooks(spark, sfDir))
      .select("cell_id").distinct().collect().map(r => s"cell_id=${r.getInt(0)}").toSet
    val filesAfter = partFiles()
    filesBefore.foreach { case (cell, files) =>
      if (!batchCells.contains(cell))
        assert(filesAfter(cell) == files, s"untouched partition $cell was rewritten")
      else
        assert(files.subsetOf(filesAfter(cell)), s"append must not rewrite $cell's files")
    }

    // (b) a probe over the appended table == the same probe over a
    // one-shot in-flight encode of corpus ∪ batch
    val oneShot = sim.Similarity.probeCompressed(spark, sfDir,
      sim.Similarity.encodeVectors(
        Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
          .unionByName(batch),
        ml.Centroids.centers(spark, sfDir), ml.Centroids.pqCodebooks(spark, sfDir)))
    // the clones carry labels only on original rows; compare (vec_id, cos)
    val got = sim.Similarity.probeCompressed(spark, sfDir, spark.table(t))
      .select("vec_id", "cell_id", "cos_sim").collect().toSeq
    val want = oneShot.select("vec_id", "cell_id", "cos_sim").collect().toSeq
    assert(got == want, s"probe over appended index diverged:\n$got\nvs\n$want")

    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("appendToNswTables: appended vectors become searchable, old partition files untouched") {
    val adj = "graft_test_nsw_adj"
    val ent = "graft_test_nsw_entry"
    sim.Similarity.writeNswTables(spark, sfDir, adj, ent)

    val root = new java.io.File(
      spark.sessionState.conf.warehousePath.stripPrefix("file:"),
      s"graft-nsw/$adj")
    def partFiles(): Map[String, Set[String]] =
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("pbucket="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val filesBefore = partFiles()
    val edgesBefore = spark.table(adj).count()

    // the batch: CLONES of the exact top-10 vectors for the fixed query
    // (shifted ids) — after the append, a search must surface them
    // alongside their originals, proving new nodes are reachable through
    // the appended (forward + reverse + hub) edges
    val batch = sim.Similarity.q50.fn(spark, sfDir)
      .select("vec_id").join(Tables.embeddings(spark, sfDir), "vec_id")
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    sim.Similarity.appendToNswTables(spark, sfDir, adj, batch)

    // (a) partitions whose bucket got no new edges keep their exact
    // files; touched buckets only GAIN files
    val filesAfter = partFiles()
    val newEdges = spark.table(adj).count() - edgesBefore
    assert(newEdges > 0, "append added no edges")
    filesBefore.foreach { case (bucket, files) =>
      assert(files.subsetOf(filesAfter(bucket)),
        s"append must never rewrite $bucket's existing files")
    }

    // (b) the clones are found: search top-20 must contain >= 9 of the
    // 10 clone ids (each ties its original's cosine exactly)
    val (top, _) = sim.Similarity.nswSearch(spark, sfDir, 20,
      tables = Some((adj, ent)))
    val cloneHits = top.map(_._1).count(_ >= 1000000L)
    assert(cloneHits >= 9, s"only $cloneHits/10 appended clones reachable: " +
      top.map(_._1).mkString(","))

    spark.sql(s"DROP TABLE IF EXISTS $adj")
    spark.sql(s"DROP TABLE IF EXISTS $ent")
  }
}
