package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events table has shipped under two parquet encodings across corpus
  * regenerations: plain timestamp[us] (isAdjustedToUTC=false, read by Spark
  * as TIMESTAMP_NTZ) and legacy TIMESTAMP(NANOS) (readable only as a raw
  * nanos long). `Tables.events` must normalize BOTH to the same
  * (`ts` micros timestamp, `ts_us` bigint) pair so a driver-side
  * regeneration can never silently flip the 18 downstream consumers again.
  */
class EventsSchemaSpec extends SparkSpec {

  private val micros: Seq[Long] = Seq(
    1700000000000000L, // 2023-11-14T22:13:20Z
    1700000003250000L,
    1700086400123456L, // next day, sub-ms precision survives
    0L)                // epoch boundary

  private def baseRows(tsCol: (Long, Int) => Any, tsType: DataType) = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsCol(us, i), (i % 2).toLong, s"type_$i", i * 1.5, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  private def normalized(dir: String): Set[(Long, Long, java.sql.Timestamp)] =
    Tables.events(spark, dir)
      .select("event_id", "ts_us", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .toSet

  test("timestamp[us] and legacy nanos-long encodings normalize identically") {
    val root = java.nio.file.Files.createTempDirectory("graft-events-enc")

    // Encoding A: timestamp[us] with isAdjustedToUTC=false — what the
    // regenerated corpus stores; Spark writes TimestampNTZType exactly so.
    val ntzDir = root.resolve("ntz").toString
    baseRows((us, _) => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC),
        TimestampNTZType)
      .write.parquet(s"$ntzDir/events.parquet")

    // Encoding B: the legacy nanos count. Spark cannot author parquet
    // TIMESTAMP(NANOS), but under the legacy flag such a file surfaces as a
    // raw INT64 — identical, from the loader's view, to a plain long nanos
    // column, which is what we write to exercise that branch.
    val nanosDir = root.resolve("nanos").toString
    baseRows((us, _) => us * 1000L, LongType)
      .write.parquet(s"$nanosDir/events.parquet")

    val a = normalized(ntzDir)
    val b = normalized(nanosDir)
    assert(a == b, s"encodings diverged:\nA=$a\nB=$b")

    // and the normalized values are the literal micros we authored
    val expectUs = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.toSet
    assert(a.map(t => (t._1, t._2)) == expectUs)
  }

  test("normalized ts is a session-zoned timestamp whose micros equal ts_us") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts_us").dataType == LongType)
    val bad = df.filter(unix_micros(col("ts")) =!= col("ts_us")).count()
    assert(bad == 0L)
  }
}
