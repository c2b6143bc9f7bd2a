package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only per-query profiler: runs each named query like [[BenchOne]]
  * but attaches a listener that attributes wall time to Spark jobs —
  * job count, stage count, task count, summed task wall, and the top
  * stages by duration — so "is this query job-overhead-bound or
  * compute-bound?" is a measurement, not a guess. Not part of the
  * driver contract.
  */
object ProfileOne {
  final class L extends SparkListener {
    case class St(name: String, tasks: Int, taskMs: Long, wallMs: Long)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    var jobs = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val wall = (for {a <- i.completionTime; b <- i.submissionTime}
        yield a - b).getOrElse(0L)
      // the callsite name for broadcast builds is an opaque future frame;
      // pull the first graft.* frame out of the details stack instead
      val site = i.details.linesIterator
        .find(l => l.contains("graft.") && !l.contains("ProfileOne"))
        .map(_.trim.take(90)).getOrElse(i.name.linesIterator.next().take(70))
      val m = i.taskMetrics
      stages += St(site + f" [gc=${m.jvmGCTime}ms cpu=${m.executorCpuTime / 1000000}ms " +
        f"deser=${m.executorDeserializeTime}ms in=${m.inputMetrics.recordsRead}r " +
        f"sh=${m.shuffleReadMetrics.recordsRead}r]",
        i.numTasks, m.executorRunTime, wall)
    }
    def reset(): Unit = { stages.clear(); jobs = 0 }
    def report(): String = {
      val top = stages.sortBy(-_.wallMs).take(12).map(s =>
        f"      ${s.wallMs}%6d ms wall ${s.taskMs}%7d ms task ${s.tasks}%4d t  ${s.name}")
      f"jobs=$jobs stages=${stages.size} tasks=${stages.map(_.tasks).sum} " +
        f"stageWallSum=${stages.map(_.wallMs).sum} ms taskSum=${stages.map(_.taskMs).sum} ms\n" +
        top.mkString("\n")
    }
  }
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK", "4096"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .config("spark.ui.enabled", "false")
      // dev lever: SPARK_GRAFT_PROFILE_CONF="k1=v1;k2=v2" for A/B conf runs
      .config(sys.env.get("SPARK_GRAFT_PROFILE_CONF").toSeq
        .flatMap(_.split(";")).map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val l = new L
    spark.sparkContext.addSparkListener(l)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      for (rep <- 1 to 2) {
        l.reset()
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        if (rep == 2) {
          println(f"== $n rep$rep: $dt%.2f s ($c rows)  ${l.report()}")
        }
      }
    }
    spark.stop()
  }
}
