package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in batched partition
  * passes.
  *
  * This container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; the Spark-side plumbing — schema,
  * binary handling, batch shape, partition-parallel extraction — is real
  * and is what carries to 100 TB (each partition streams fixed-size
  * batches through the "decoder", no driver involvement).
  *
  * Batch shape note: `mapInPandas` is PySpark's surface for exactly this
  * vectorized-decode pattern (a Python iterator of record batches). From
  * Scala the same execution shape is `mapPartitions` pulling fixed-size
  * batches (`grouped(DecodeBatchSize)`) — one decoder invocation per
  * batch, columnar-batch-sized memory, identical partition parallelism —
  * so swapping in a Python/Pandas decoder changes the UDF registration,
  * not the distributed plan.
  */
object Binary {

  // q70 — binary column + typed metadata, fully oracle-checkable: byte
  // length, sha256, leading-bytes "magic", ascii flag.
  val q70: QueryDef = QueryDef.sql(
    "q70_binary_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  sha256(text) AS sha,
      |  lower(hex(encode(substr(text, 1, 4)))) AS magic,
      |  (octet_length(encode(text)) = length(text)) AS is_ascii
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        lower(sha2(encode(col("text"), "UTF-8"), 256)).as("sha"),
        lower(hex(encode(substring(col("text"), 1, 4), "UTF-8"))).as("magic"),
        (octet_length(col("text")) === length(col("text"))).as("is_ascii"))
      .orderBy("doc_id")
  }

  /** STUB — stands in for a real media decoder (image resize / audio
    * frame-sample). Deterministic byte-histogram moments so tests are
    * stable; a real deployment swaps only this function, the distributed
    * plumbing around it is unchanged.
    */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    hist.map(_ / n)
  }

  private val DecodeBatchSize = 64

  // q71 — batched partition-parallel feature extraction over the binary
  // payload. The stub decoder is a deterministic byte-histogram, and the
  // corpus is pure ASCII (byte == code point, asserted by q70's is_ascii),
  // so DuckDB replays the digest exactly — the whole decode PLUMBING
  // (binary handling, batch shape, partition parallelism) is
  // hash-verified; a real codec swap would return this entry to
  // rows-only. Fractions are emitted as a sortable digest (dim, rounded
  // sum, rounded max) — raw array columns crash the driver's rows check.
  val q71: QueryDef = QueryDef.sql(
    "q71_decode_features",
    """WITH h AS (
      |  SELECT doc_id, length(text) AS n,
      |    list_transform(range(0, 8), b -> CAST(len(list_filter(range(1, length(text) + 1),
      |      i -> (unicode(substr(text, CAST(i AS INT), 1)) // 32) = b)) AS DOUBLE)
      |      / greatest(length(text), 1)) AS fr
      |  FROM documents)
      |SELECT doc_id, CAST(n AS INTEGER) AS n_bytes, CAST(8 AS INTEGER) AS n_features,
      |  round_even(list_sum(fr), 6) AS feat_sum,
      |  round_even(list_max(fr), 6) AS feat_max
      |FROM h
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        octet_length(col("text")).as("n_bytes"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("n_features", IntegerType),
      StructField("feat_sum", DoubleType),
      StructField("feat_max", DoubleType)))
    // Batched decode: each partition pulls fixed-size batches through the
    // stub decoder — mirrors a vectorized media-decode UDF's batch shape.
    val rows = src.rdd.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val f = decodeStub(payload)
          Row(r.getAs[Long]("doc_id"), r.getAs[Int]("n_bytes"), f.length,
            math.rint(f.sum * 1e6) / 1e6, math.rint(f.max * 1e6) / 1e6)
        }
      }
    }
    s.createDataFrame(rows, outSchema).orderBy("doc_id")
  }

  private val FrameBytes = 64
  private val FrameStride = 4 // keep every 4th frame

  // q72 — frame sampling over a binary payload: treat the payload as a
  // sequence of fixed-size frames (video-decode shape), keep every k-th
  // frame, decode each kept frame through the stub. One row per kept
  // frame; partition-parallel, no driver involvement. Oracle-checked for
  // the same reason as q71 (deterministic stub + ASCII corpus); frame
  // fractions are /64 — exact binary, so the rounds are boundary-free.
  val q72: QueryDef = QueryDef.sql(
    "q72_frame_sample",
    """WITH fr AS (
      |  SELECT doc_id, CAST(u.f AS INTEGER) AS frame_idx,
      |    list_transform(range(0, 8), b -> CAST(len(list_filter(range(1, 65),
      |      i -> (unicode(substr(text, CAST(u.f * 64 + i AS INT), 1)) // 32) = b)) AS DOUBLE) / 64) AS feats
      |  FROM documents, unnest(range(0, length(text) // 64, 4)) AS u(f))
      |SELECT doc_id, frame_idx, CAST(8 AS INTEGER) AS n_features,
      |  round_even(list_sum(feats), 6) AS feat_sum,
      |  round_even(list_max(feats), 6) AS feat_max
      |FROM fr
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("n_features", IntegerType),
      StructField("feat_sum", DoubleType),
      StructField("feat_max", DoubleType)))
    // Per-frame features emitted as a sortable digest — see q71 note.
    val rows = src.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val nFrames = payload.length / FrameBytes
        (0 until nFrames by FrameStride).iterator.map { f =>
          val frame = java.util.Arrays.copyOfRange(payload, f * FrameBytes, (f + 1) * FrameBytes)
          val feats = decodeStub(frame)
          Row(r.getAs[Long]("doc_id"), f, feats.length,
            math.rint(feats.sum * 1e6) / 1e6, math.rint(feats.max * 1e6) / 1e6)
        }
      }
    }
    s.createDataFrame(rows, outSchema).orderBy("doc_id", "frame_idx")
  }

  val all: Seq[QueryDef] = Seq(q70, q71, q72)
}
