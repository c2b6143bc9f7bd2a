package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

class FileStreamSpec extends SparkSpec {

  test("events parquet replayed as a file stream matches the batch windows") {
    // file-source streaming read of the real events table (timestamp[us]
    // NTZ → session-zoned µs timestamp, as in Tables.events; UTC session
    // makes the cast an identity on the stored micros)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // file-source streams need a directory: stage the table file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", col("ts").cast(TimestampType))
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

  test("streamJsonl ingests arriving files with quarantine rows, batch-read parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream")
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    write("part1.jsonl", Seq(
      """{"doc_id": 1, "lang": "en", "source": "s0", "text": "hello world"}""",
      """this line is not json at all"""))
    val q = sources.CorpusSource.streamJsonl(spark, dir.toString)
      .writeStream.format("memory").queryName("jsonl_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    q.processAllAvailable()
    // a second file arrives mid-stream
    write("part2.jsonl", Seq(
      """{"doc_id": 2, "lang": "de", "source": "s1", "text": "zweites dokument"}"""))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("jsonl_stream").collect()
    assert(rows.length == 3)
    val clean = rows.filter(_.getAs[String]("_corrupt_record") == null)
    assert(clean.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L))
    val dirty = rows.filter(_.getAs[String]("_corrupt_record") != null)
    assert(dirty.length == 1 &&
      dirty.head.getAs[String]("_corrupt_record").contains("not json"))
    // same rows the batch reader produces over the final directory
    val batch = sources.CorpusSource.readJsonl(spark, dir.toString).collect()
    assert(batch.map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
  }

  test("resampleStream: streamed fan-out equals the batch face and q160's copy counts") {
    val schedule = text.TextAnalysis.resampleSchedule(spark, sfDir)
    val batch = streaming.Events.resampleStream(
      Tables.documents(spark, sfDir), schedule).collect()
    // per-source emitted rows must equal q160's per-source copy totals
    val q160 = text.TextAnalysis.q160.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("copies")).toMap
    val bySource = batch.groupBy(_.getAs[String]("source"))
      .map { case (s, g) => s -> g.length.toLong }
    q160.foreach { case (s, copies) =>
      assert(bySource.getOrElse(s, 0L) == copies, s"source $s fan-out")
    }
    // copy_idx is a dense 1..copies tag per doc
    batch.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, g) =>
      val idxs = g.map(_.getAs[Long]("copy_idx")).sorted.toSeq
      assert(idxs == (1L to g.length.toLong), s"doc $id copy_idx $idxs")
    }
    // streamed face: identical multiset
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-resample")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val q = streaming.Events.resampleStream(
        spark.readStream.schema(schema).parquet(dir.toString), schedule)
      .writeStream.format("memory").queryName("resample")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("resample").collect().map(_.toSeq).toSet
    assert(streamed == batch.map(_.toSeq).toSet)
  }

  test("qualityGateStream: streamed decisions match the batch face and q151/q152 metrics") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-qgate")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val q = streaming.Events.qualityGateStream(
        spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.format("memory").queryName("qgate")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qgate").collect().map(_.toSeq).toSet
    // batch face: the same function over the batch reader
    val batch = streaming.Events.qualityGateStream(
      Tables.documents(spark, sfDir)).collect()
    assert(streamed == batch.map(_.toSeq).toSet)
    // metric parity with the catalog queries the gate composes
    val q151 = text.TextAnalysis.q151.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ratio")).toMap
    val q152 = text.TextAnalysis.q152.fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    batch.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Double]("ratio") == q151(id), s"doc $id ratio")
      assert(r.getAs[Double]("entropy") == q152(id), s"doc $id entropy")
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Double]("ratio") >= 0.25 - 1e-9 &&
          r.getAs[Double]("entropy") >= 1.5 - 1e-9 &&
          r.getAs[Int]("n_tok") >= 5) ||
        // keep is decided on UNROUNDED ratio/entropy; rounded-value
        // reconstruction may disagree only inside a 1e-6 band
        math.abs(r.getAs[Double]("ratio") - 0.25) < 1e-6 ||
        math.abs(r.getAs[Double]("entropy") - 1.5) < 1e-6)
    }
  }
}
