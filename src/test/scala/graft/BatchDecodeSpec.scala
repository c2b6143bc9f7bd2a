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
}
