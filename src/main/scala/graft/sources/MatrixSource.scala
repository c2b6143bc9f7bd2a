package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Headerless CSV matrix ingest/egress — the reference's data interchange
  * format (dl4jGANComputerVision.java:372-400 reads `mnist_train.csv`:
  * N feature columns + a trailing label column; gan.ipynb cell 2 writes
  * it). CSV scans are splittable, so ingest parallelizes across executors;
  * the features land in one `array<double>` column ready for the
  * GAN/classifier pipeline.
  */
object MatrixSource {

  /** Read `path` as (features: array<double>, label: double) with
    * `nFeatures` leading columns.
    */
  def readCsvMatrix(spark: SparkSession, path: String, nFeatures: Int): DataFrame = {
    val schema = StructType(
      (0 until nFeatures).map(i => StructField(s"f$i", DoubleType, nullable = false)) :+
        StructField("label", DoubleType, nullable = false))
    spark.read.schema(schema).csv(path)
      .select(array((0 until nFeatures).map(i => col(s"f$i")): _*).as("features"),
        col("label"))
  }

  /** Write (features: array<double>, label) back to headerless CSV. */
  def writeCsvMatrix(df: DataFrame, nFeatures: Int, path: String): Unit =
    df.select(
      (0 until nFeatures).map(i => col("features").getItem(i).as(s"f$i")) :+
        col("label").cast(DoubleType): _*)
      .write.mode("overwrite").csv(path)
}
