package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamDedupSpec extends SparkSpec {

  test("streaming dropDuplicates within watermark suppresses replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val stream = graft.streaming.Events.dedupStream(
      mem.toDF().toDF("ts", "event_id"), "event_id", "1 hour")
    val q = stream.writeStream
      .format("memory").queryName("dedup_stream").outputMode(OutputMode.Append).start()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (Timestamp.valueOf("2024-01-01 10:00:01"), 2L))
    q.processAllAvailable()
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L), // replayed id
      (Timestamp.valueOf("2024-01-01 10:05:01"), 3L))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }
}
