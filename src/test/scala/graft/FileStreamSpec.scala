package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

class FileStreamSpec extends SparkSpec {

  test("events parquet replayed as a file stream matches the batch windows") {
    // file-source streaming read of the real events table (nanos ts → µs,
    // as in Tables.events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // file-source streams need a directory: stage the table file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = streaming.Events.windowedAggStream(stream).writeStream
      .format("memory").queryName("file_win").outputMode(OutputMode.Update).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("file_win")
      .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))
      .collect().map(_.toSeq).toSet
    val batch = streaming.Events.q80.fn(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
