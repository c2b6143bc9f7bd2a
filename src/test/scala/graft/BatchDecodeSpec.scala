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

  test("PNG decoder: real encoded bytes through the columnar contract, batch-boundary independent") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // deterministic fixtures: solid fills, gradients, and a checkerboard
    // at two sizes — REAL PNG encodings, not synthetic byte streams
    def render(id: Int): BufferedImage = {
      val (w, h) = if (id % 2 == 0) (16, 12) else (9, 21)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = id % 3 match {
          case 0 => (id * 21 % 256) << 16 | (id * 47 % 256) << 8 | (id * 89 % 256)
          case 1 => (x * 255 / math.max(w - 1, 1)) << 16 |
            (y * 255 / math.max(h - 1, 1)) << 8 | 128
          case _ => if ((x + y) % 2 == 0) 0xffffff else 0x000000
        }
        img.setRGB(x, y, rgb)
      }
      img
    }
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val images = (0 until 12).map(i => i.toLong -> render(i))
    val payloads = images.map { case (id, img) => (id, png(img)) } :+
      // corrupt payload: a truncated PNG must quarantine, not throw
      (99L, png(render(0)).take(40))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map { case (id, p) => Row(id, p) }, 4),
      schema)
    val ref = Binary.decodeWith(spark, src, Binary.PngBatchDecoder, 64)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Double](2).toList)).toMap
    // boundary independence: per-item results identical at any batch size
    for (bs <- Seq(1, 3)) {
      val got = Binary.decodeWith(spark, src, Binary.PngBatchDecoder, bs)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getSeq[Double](2).toList)).toMap
      assert(got == ref, s"batchSize=$bs changed the PNG decode output")
    }
    // decoded features equal the directly-computed truth (PNG is
    // lossless, so the luma histogram must be EXACT)
    images.foreach { case (id, img) =>
      val (w, h) = (img.getWidth, img.getHeight)
      val hist = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 +
          ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        hist(lum >> 5) += 1
      }
      val expect = List(w.toDouble, h.toDouble) ++
        hist.map(_.toDouble / (w * h)).toList
      assert(ref(id)._2 == expect, s"image $id decoded features diverged")
    }
    // the corrupt payload yields the sentinel row
    assert(ref(99L)._2 == List.fill(10)(-1.0), "corrupt PNG must quarantine")
    // router dispatch: the png modality resolves to the real decoder
    assert(Binary.decoderFor("png") eq Binary.PngBatchDecoder)
  }

  test("WAV decoder: real encoded bytes through the columnar contract, batch-boundary independent") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // deterministic PCM synthesis: integer-sawtooth and square waves so
    // the expected features are computable exactly from the sample array
    def synth(id: Int): (Array[Short], Int, Float) = {
      val n = 200 + 37 * id
      val channels = 1 + (id % 2)
      val rate = if (id % 3 == 0) 8000f else 16000f
      val samples = Array.tabulate[Short](n * channels) { k =>
        val phase = (k * (id + 3)) % 97
        val v =
          if (id % 2 == 0) ((phase - 48) * 600).toShort       // sawtooth
          else (if (phase < 48) 9000 else -9000).toShort      // square
        v
      }
      (samples, channels, rate)
    }
    def wav(samples: Array[Short], channels: Int, rate: Float,
        bigEndian: Boolean): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, k) =>
        if (bigEndian) {
          bytes(2 * k) = (s >> 8).toByte; bytes(2 * k + 1) = s.toByte
        } else {
          bytes(2 * k) = s.toByte; bytes(2 * k + 1) = (s >> 8).toByte
        }
      }
      val fmt = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, rate, 16, channels,
        2 * channels, rate, bigEndian)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt,
        samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val waves = (0 until 8).map(i => i.toLong -> synth(i))
    val payloads = waves.map { case (id, (sm, ch, rate)) =>
      (id, wav(sm, ch, rate, bigEndian = id % 4 == 1)) } :+
      (99L, wav(synth(0)._1, 1, 8000f, bigEndian = false).take(30))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(
        payloads.map { case (id, p) => Row(id, p) }, 4), schema)
    val ref = Binary.decodeWith(spark, src, Binary.WavBatchDecoder, 64)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](2).toList).toMap
    for (bs <- Seq(1, 3)) {
      val got = Binary.decodeWith(spark, src, Binary.WavBatchDecoder, bs)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Double](2).toList).toMap
      assert(got == ref, s"batchSize=$bs changed the WAV decode output")
    }
    // decoded features equal the directly-computed truth (PCM is
    // lossless; every accumulation is integer-exact). Level stats run
    // over all interleaved samples; the zero-crossing walk strides per
    // channel — for the stereo fixtures a channel-to-channel sign flip
    // at a frame boundary is NOT a waveform crossing.
    waves.foreach { case (id, (sm, ch, rate)) =>
      val n = sm.length
      val frames = n / ch
      var sum = 0L; var sumAbs = 0L; var sumSq = 0L; var peak = 0L
      sm.foreach { s =>
        sum += s; sumAbs += math.abs(s.toLong); sumSq += s.toLong * s
        peak = math.max(peak, math.abs(s.toLong))
      }
      var zc = 0L
      for (c <- 0 until ch) {
        var prev = 0; var seen = false
        var j = c
        while (j < n) {
          val s = sm(j)
          if (seen && ((s > 0 && prev < 0) || (s < 0 && prev > 0))) zc += 1
          if (s != 0) { prev = s; seen = true }
          j += ch
        }
      }
      val expect = List(ch.toDouble, rate.toDouble, frames.toDouble,
        peak.toDouble, sum.toDouble / n, sumAbs.toDouble / n,
        math.sqrt(sumSq.toDouble / n),
        zc.toDouble / math.max(ch.toLong * (frames - 1), 1L))
      assert(ref(id) == expect, s"wave $id decoded features diverged")
    }
    // the corrupt payload yields the sentinel row
    assert(ref(99L) == List.fill(8)(-1.0), "corrupt WAV must quarantine")
    // router dispatch: the wav modality resolves to the real decoder
    assert(Binary.decoderFor("wav") eq Binary.WavBatchDecoder)
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
