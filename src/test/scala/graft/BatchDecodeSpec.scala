package graft

import graft.multimodal.Binary
import graft.multimodal.Binary.{BinaryBatch, HistBatchDecoder}

/** The columnar decode path: the vectorized decoder must agree with the
  * per-item stub, and digests must be independent of where batch
  * boundaries fall (including frames straddling batches).
  */
class BatchDecodeSpec extends SparkSpec {

  test("vectorized decoder matches the per-item stub bit-for-bit") {
    val payloads = Seq(
      "hello world".getBytes("UTF-8"),
      Array.empty[Byte],
      (0 until 300).map(i => (i % 251).toByte).toArray,
      "Z".getBytes("UTF-8"))
    val batch = BinaryBatch.pack(
      payloads.zipWithIndex.iterator.map { case (p, i) => (i.toLong, i, p) })
    val mat = HistBatchDecoder.decode(batch)
    payloads.zipWithIndex.foreach { case (p, i) =>
      val expect = Binary.decodeStub(p)
      val got = mat.slice(i * 8, i * 8 + 8).toSeq
      assert(got == expect.toSeq, s"item $i diverged")
    }
  }

  test("q71 digests are independent of the decode batch size") {
    val ref = Binary.decodeFeaturesDf(spark, sfDir, 64).collect().toSeq
    for (bs <- Seq(1, 7, 100000)) {
      val got = Binary.decodeFeaturesDf(spark, sfDir, bs).collect().toSeq
      assert(got == ref, s"batchSize=$bs changed the output")
    }
  }

  test("q72 frame digests survive frames straddling batch boundaries") {
    val ref = Binary.frameSampleDf(spark, sfDir, 64).collect().toSeq
    // batchSize 3 guarantees one document's sampled frames split across
    // many batches; 1 is the degenerate per-frame case
    for (bs <- Seq(1, 3)) {
      val got = Binary.frameSampleDf(spark, sfDir, bs).collect().toSeq
      assert(got == ref, s"batchSize=$bs changed the output")
    }
  }

  test("q193 perceptual near-dup matches a dense aHash + band replay") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def sig(text: String): Array[Boolean] = {
      val codes = text.map(_.toLong)
      val len = codes.length.toLong
      val tot = codes.sum
      Array.tabulate(64) { j =>
        val lo = (len * j / 64).toInt; val hi = (len * (j + 1) / 64).toInt
        if (hi > lo) {
          val bs = codes.slice(lo, hi).sum
          bs * len > tot * (hi - lo)
        } else false
      }
    }
    val sigs = docs.map { case (id, t) => id -> sig(t) }.toMap
    // band candidates: 4 bands x 16 bits
    val byBand = collection.mutable.Map.empty[(Int, Seq[Boolean]), List[Long]]
    sigs.foreach { case (id, sg) =>
      for (k <- 0 until 4) {
        val key = (k, sg.slice(k * 16, k * 16 + 16).toSeq)
        byBand(key) = id :: byBand.getOrElse(key, Nil)
      }
    }
    val expect = byBand.values.flatMap { ids =>
      val sorted = ids.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.size) yield (sorted(i), sorted(j))
    }.toSet.flatMap { p: (Long, Long) =>
      val h = sigs(p._1).zip(sigs(p._2)).count { case (a, b) => a != b }
      if (h <= 12) Some((p._1, p._2, h.toLong)) else None
    }
    val got = multimodal.Binary.q193.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSet
    assert(got == expect, s"got ${got.size} pairs, expect ${expect.size}")
    assert(expect.nonEmpty, "the corpus must surface perceptual near-dups")
    // signatures are genuinely discriminative: far more docs than pairs
    assert(expect.size < docs.length / 10)
  }
}
