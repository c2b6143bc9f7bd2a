package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
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
