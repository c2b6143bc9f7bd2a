package graft
import org.apache.spark.sql.SparkSession

/** One-off diagnostic: run queries and report every cached RDD's memory
  * footprint after each, so a storage-budget regression (the Bench gate)
  * can be attributed to its memo. Dev tool — not part of the driver
  * surface.
  */
object StorageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      SparkEntry.queries(n)(spark, d).count()
      val infos = spark.sparkContext.getRDDStorageInfo
        .filter(_.memSize > 0).sortBy(-_.memSize)
      println(s"== after $n: total ${infos.map(_.memSize).sum / 1048576} MiB")
      infos.take(8).foreach { i =>
        println(f"   ${i.memSize / 1048576.0}%8.1f MiB  ${i.name}")
      }
    }
    spark.stop()
  }
}
