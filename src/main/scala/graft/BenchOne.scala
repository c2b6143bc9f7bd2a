package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    // honor the same env as graft.Bench so one-off numbers are comparable
    // (r2 lesson: local[16] vs local[32] numbers are NOT comparable)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK", "4096"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, d).count()
      println(f"$n rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    spark.stop()
  }
}
