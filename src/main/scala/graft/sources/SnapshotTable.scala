package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A manifest-based snapshot table: atomic commits, time travel,
  * compaction, and safe file expiry over plain parquet — the
  * transactional layer a 100 TB curation pipeline needs under its
  * long-running jobs (a dedup pass that runs for hours must see ONE
  * corpus version from first scan to last, while ingestion keeps
  * appending).
  *
  * Design (the standard log-structured table-format shape, built only on
  * the Spark/Hadoop FS API):
  *
  *   table/
  *     data/<commit-uuid>/part-*.parquet   -- immutable once written
  *     snapshots/v<N>.json                 -- file list + lineage for N
  *     HEAD                                -- "<N>", swapped by rename
  *
  * The commit protocol orders writes so every failure mode degrades to
  * "invisible garbage", never a torn table: (1) data files land under a
  * fresh uuid dir — unreferenced until a manifest names them; (2) the
  * snapshot manifest v<N>.json is written and renamed into place —
  * unreadable until HEAD points at it; (3) HEAD is replaced by
  * write-temp + atomic rename. A reader resolves HEAD exactly once, then
  * reads only manifest-listed files — never a directory listing — so
  * concurrent commits and stray files (a crashed writer's half-landed
  * uuid dir) are invisible by construction. On object stores without
  * atomic rename the HEAD swap needs a conditional put; the manifest
  * protocol is unchanged (reference behavior, not a local-FS trick).
  *
  * Each snapshot's manifest carries the FULL file list (no delta
  * chains): O(files) JSON per commit, read back in one file open —
  * at 100 TB the manifest is megabytes while the data is the problem.
  * Row counts ride in the manifest so `count()`-class questions never
  * touch data files.
  *
  * Reference analogue: the reference persists model state as versioned
  * whole artifacts and reloads them by name
  * (Java/src/main/java/org/deeplearning4j/dl4jGANComputerVision.java:605-619);
  * this is the same publish-then-swap discipline applied to a table of
  * rows.
  */
object SnapshotTable {

  private def fs(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def readSmallFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def writeFileAtomic(f: FileSystem, p: Path, body: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p)) sys.error(s"atomic rename failed for $p")
  }

  /** A snapshot manifest: the complete state of one table version. */
  final case class Snapshot(version: Long, parent: Long, files: Seq[String],
      rowCount: Long)

  private def manifestPath(dir: String, v: Long) =
    new Path(s"$dir/snapshots/v$v.json")

  // hand-rolled flat JSON (no extra deps): fields are a long triple plus
  // a string array of relative paths with no escapable characters (uuid
  // dirs + parquet part names)
  private def renderManifest(m: Snapshot): String =
    s"""{"version":${m.version},"parent":${m.parent},"rowCount":${m.rowCount},""" +
      s""""files":[${m.files.map(f => "\"" + f + "\"").mkString(",")}]}"""

  private def parseManifest(body: String): Snapshot = {
    def longField(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(body).get.group(1).toLong
    val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(body).get.group(1)
    val list = if (files.isEmpty) Seq.empty[String]
      else files.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
    Snapshot(longField("version"), longField("parent"), list, longField("rowCount"))
  }

  /** The committed HEAD version, or -1 for an empty/new table. */
  def currentVersion(s: SparkSession, dir: String): Long = {
    val f = fs(s, dir)
    val head = new Path(s"$dir/HEAD")
    if (f.exists(head)) readSmallFile(f, head).trim.toLong else -1L
  }

  /** Read one manifest (any retained version, not just HEAD). */
  def snapshot(s: SparkSession, dir: String, version: Long): Snapshot = {
    val f = fs(s, dir)
    val p = manifestPath(dir, version)
    require(f.exists(p), s"snapshot v$version does not exist (expired or never committed)")
    parseManifest(readSmallFile(f, p))
  }

  /** Land `df` as data files under a fresh uuid dir; returns the
    * relative file paths and exact row count (from the files just
    * written — one cheap footer-only count job, no second data pass).
    */
  private def landDataFiles(s: SparkSession, dir: String, df: DataFrame): (Seq[String], Long) = {
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"data/$commitId"
    df.write.parquet(s"$dir/$rel")
    val f = fs(s, dir)
    val parts = f.listStatus(new Path(s"$dir/$rel")).toSeq
      .filter(st => st.getPath.getName.startsWith("part-"))
      .map(st => s"$rel/${st.getPath.getName}")
    val n = s.read.parquet(parts.map(p => s"$dir/$p"): _*).count()
    (parts, n)
  }

  private def publish(s: SparkSession, dir: String, files: Seq[String], n: Long): Long = {
    val f = fs(s, dir)
    val parent = currentVersion(s, dir)
    val v = parent + 1
    writeFileAtomic(f, manifestPath(dir, v), renderManifest(Snapshot(v, parent, files, n)))
    writeFileAtomic(f, new Path(s"$dir/HEAD"), v.toString)
    v
  }

  /** Commit `df` as a brand-new table version REPLACING the current
    * contents (overwrite semantics). Returns the new version.
    */
  def commit(s: SparkSession, dir: String, df: DataFrame): Long = {
    val (files, n) = landDataFiles(s, dir, df)
    publish(s, dir, files, n)
  }

  /** Commit `df` as a new version holding current contents PLUS `df`
    * (append semantics — prior data files are referenced, never
    * rewritten or moved: an append's write cost is O(new data) only).
    */
  def append(s: SparkSession, dir: String, df: DataFrame): Long = {
    val (files, n) = landDataFiles(s, dir, df)
    val parent = currentVersion(s, dir)
    val base = if (parent < 0) Snapshot(-1, -1, Nil, 0) else snapshot(s, dir, parent)
    publish(s, dir, base.files ++ files, base.rowCount + n)
  }

  /** Read the table as of `version` (default: HEAD). Only
    * manifest-listed files are opened — a concurrent commit or a
    * crashed writer's stray files cannot appear mid-scan.
    */
  def read(s: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else currentVersion(s, dir)
    require(v >= 0, s"snapshot table $dir has no committed version")
    val m = snapshot(s, dir, v)
    if (m.files.isEmpty) s.emptyDataFrame
    else s.read.parquet(m.files.map(p => s"$dir/$p"): _*)
  }

  /** Exact HEAD row count from manifest metadata — no data files read. */
  def rowCount(s: SparkSession, dir: String): Long =
    snapshot(s, dir, currentVersion(s, dir)).rowCount

  /** Rows ADDED between two versions: the files `toVersion` references
    * that `fromVersion` does not, read directly. Because data files are
    * immutable and appends only ever extend the file list, this is an
    * exact O(delta-files) incremental read — the input an index-refresh
    * job (signature tables, ANN cells, vocab counts) wants, costing
    * O(new data) regardless of table size. For a version produced by
    * `commit`/`compact` (a rewrite) the file sets are disjoint, so this
    * degenerates to the full new version — callers that need
    * append-only lineage can assert `isAppendLineage` first.
    */
  def changes(s: SparkSession, dir: String, fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"changes: fromVersion $fromVersion > toVersion $toVersion")
    val fromFiles =
      if (fromVersion < 0) Set.empty[String]
      else snapshot(s, dir, fromVersion).files.toSet
    val added = snapshot(s, dir, toVersion).files.filterNot(fromFiles)
    if (added.isEmpty) s.emptyDataFrame
    else s.read.parquet(added.map(p => s"$dir/$p"): _*)
  }

  /** True iff every file of `fromVersion` is still referenced at
    * `toVersion` — i.e. the lineage between them is pure appends, so
    * [[changes]] is exactly "the new rows" (no rewrite in between).
    */
  def isAppendLineage(s: SparkSession, dir: String, fromVersion: Long, toVersion: Long): Boolean = {
    val fromFiles =
      if (fromVersion < 0) Set.empty[String]
      else snapshot(s, dir, fromVersion).files.toSet
    fromFiles.subsetOf(snapshot(s, dir, toVersion).files.toSet)
  }

  /** Rewrite the current version's files into `numFiles` and publish the
    * result as a new version (contents identical; the small-file
    * compaction every long-lived append table needs — readers pinned to
    * older versions keep their original files).
    */
  def compact(s: SparkSession, dir: String, numFiles: Int): Long =
    commit(s, dir, read(s, dir).coalesce(numFiles))

  /** Drop manifests older than the last `keepLast` versions and delete
    * data files no RETAINED version references. Deletion is computed
    * from the manifests (reference counting), so a file shared by a
    * retained and an expired version — an append lineage's common
    * prefix — is kept.
    */
  def expire(s: SparkSession, dir: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must retain at least HEAD")
    val f = fs(s, dir)
    val head = currentVersion(s, dir)
    val cut = head - keepLast + 1
    if (cut <= 0) return
    val versions = f.listStatus(new Path(s"$dir/snapshots")).toSeq
      .map(_.getPath.getName).collect { case s2 if s2.startsWith("v") =>
        s2.stripPrefix("v").stripSuffix(".json").toLong }
    val (dead, live) = versions.partition(_ < cut)
    val liveFiles = live.flatMap(v => snapshot(s, dir, v).files).toSet
    val deadFiles = dead.flatMap(v => snapshot(s, dir, v).files).toSet -- liveFiles
    deadFiles.foreach(p => f.delete(new Path(s"$dir/$p"), false))
    dead.foreach(v => f.delete(manifestPath(dir, v), false))
  }
}
