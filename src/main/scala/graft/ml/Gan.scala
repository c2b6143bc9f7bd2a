package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed GAN trainer: synchronous parameter averaging, Spark-first.
  *
  * Re-expresses the adversarial loop of dl4jGANComputerVision.java:408-511
  * — per minibatch: train the discriminator on real (smoothed label ~1)
  * and generated (label ~0) samples, then train the generator through the
  * frozen discriminator with target 1 — with the reference's
  * ParameterAveragingTrainingMaster (:325-330) mapped onto Spark
  * primitives: the driver broadcasts the current parameters, every
  * partition runs local minibatch SGD over its rows, and one
  * `treeAggregate` (depth 2) produces the example-weighted parameter
  * average per round. Communication is O(nParams · partitions) per round,
  * independent of row count — rows stream through executor partitions, so
  * the same loop holds on a 1000-executor cluster.
  */
object Gan {

  final case class Config(
      dataDim: Int = 64,
      zDim: Int = 8,
      hidden: Int = 32,
      rounds: Int = 4,
      batchSize: Int = 50,
      lrD: Double = 0.02,
      lrG: Double = 0.01,
      realLabel: Double = 0.95, // label smoothing (reference :405-406)
      seed: Long = 666L,        // reference's numberOfTheBeast (:75)
      arch: String = "mlp",     // "mlp" | "conv" (reference's CNN family)
      // Local-step cap between parameter averages. Synchronous averaging
      // of NONCONVEX nets only works while the locally-trained replicas
      // stay close to the broadcast point they started from; with the cap
      // tied to partition size, 10× more data meant 10× more local SGD
      // steps per round, the replicas diverged, and their average
      // destroyed the learned features (measured at the r9 sf1
      // checkpoint: the co-trained head fell to chance, 0.095). Capping
      // local batches per round — the local-SGD treatment: sync
      // frequency follows STEPS, not epochs — keeps divergence bounded at
      // any corpus size; a per-round rotating window keeps the full
      // partition participating across rounds. 12 = the ~sf0.1 per-round
      // batch count every accuracy bar was tuned at.
      maxBatchesPerRound: Int = 12)

  /** Discriminator for the configured architecture: the reference's CNN
    * (conv→pool→conv→pool→dense, :118-165) maps to [[ConvDis]] on the 8×8
    * embedding grid; "mlp" is the dense family.
    */
  private[ml] def mkDis(cfg: Config): Net =
    if (cfg.arch == "conv") {
      require(cfg.dataDim == 64, "conv arch expects 64-d (8x8) inputs")
      new ConvDis
    } else new Mlp2(cfg.dataDim, cfg.hidden, 1, sigmoidOut = true)

  /** Generator: the reference's upsampling CNN (:173-221) maps to
    * [[ConvGen]]; "mlp" is the dense family.
    */
  private[ml] def mkGen(cfg: Config): Net =
    if (cfg.arch == "conv") new ConvGen(cfg.zDim)
    else new Mlp2(cfg.zDim, cfg.hidden, cfg.dataDim, sigmoidOut = true)

  final case class Model(cfg: Config, dParams: Array[Double], gParams: Array[Double]) {
    @transient lazy val dis: Net = mkDis(cfg)
    @transient lazy val gen: Net = mkGen(cfg)

    def disFeatures(x: Array[Double]): Array[Double] = dis.features(dParams, x)
    def disScore(x: Array[Double]): Double = dis.fwd(dParams, x)._2(0)
    def generate(z: Array[Double]): Array[Double] = gen.fwd(gParams, z)._2
  }

  /** Min-max scale each embedding dimension to [0,1] (the reference's
    * /255 pixel normalization, gan.ipynb cell 2) — elementwise min/max via
    * one treeAggregate, then a broadcast rescale pass.
    */
  def scaled01(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("vec_id"), col("embedding")).rdd
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val (mins, maxs) = rdd.map(_._2).treeAggregate(
      (Array.fill(dim)(Double.MaxValue), Array.fill(dim)(Double.MinValue)))(
      seqOp = { case ((mn, mx), v) =>
        var i = 0
        while (i < dim) {
          if (v(i) < mn(i)) mn(i) = v(i)
          if (v(i) > mx(i)) mx(i) = v(i)
          i += 1
        }
        (mn, mx)
      },
      combOp = { case ((mn1, mx1), (mn2, mx2)) =>
        var i = 0
        while (i < dim) {
          if (mn2(i) < mn1(i)) mn1(i) = mn2(i)
          if (mx2(i) > mx1(i)) mx1(i) = mx2(i)
          i += 1
        }
        (mn1, mx1)
      }, depth = 2)
    val bc = spark.sparkContext.broadcast((mins, maxs))
    import spark.implicits._
    rdd.map { case (id, v) =>
      val (mn, mx) = bc.value
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        val range = mx(i) - mn(i)
        out(i) = if (range > 0) (v(i) - mn(i)) / range else 0.5
        i += 1
      }
      (id, out)
    }.toDF("vec_id", "x")
  }

  /** Estimated batches per partition (≥1) — sizes the rotating
    * local-step window (see Config.maxBatchesPerRound).
    */
  private def estBatchesPerPart(rows: Long, parts: Int, batchSize: Int): Int =
    math.max(1L, (rows / math.max(parts, 1) + batchSize - 1) / batchSize).toInt

  /** Is batch index `bi` inside round `round`'s modular
    * [start, start+cap) window over a `span`-batch partition?
    *
    * `span` is the FLEET-AVERAGE estimate, so a partition holding more
    * batches than it wraps `bi % span` and maps several physical batches
    * onto each window slot — selection alone would run a multiple of
    * `cap` local steps there. Callers therefore pair this with a HARD
    * per-partition counter ([[roundBatchPicker]]) that stops taking
    * batches at `cap` regardless of how many match the window: the
    * window provides cross-round ROTATION (coverage), the counter
    * provides the divergence cap, and the cap holds under partition
    * skew by construction.
    */
  private def inRoundWindow(bi: Int, round: Int, span: Int, cap: Int): Boolean =
    if (span <= cap) true
    else {
      val pos = bi % span
      val start = (round * cap) % span
      val end = (start + cap) % span
      if (start < end) pos >= start && pos < end
      else pos >= start || pos < end
    }

  /** The per-round batch selector both trainers stream through: the
    * rotating [[inRoundWindow]] picks WHICH batches this round visits,
    * and the hard `taken < cap` counter bounds HOW MANY — at most
    * `cfg.maxBatchesPerRound` local steps per partition per round, even
    * when the partition holds more batches than the fleet-average span
    * estimate.
    */
  private def roundBatchPicker[T](it: Iterator[Seq[T]], round: Int,
      span: Int, cap: Int): Iterator[Seq[T]] = {
    var taken = 0
    it.zipWithIndex.collect {
      case (b, bi) if taken < cap && inRoundWindow(bi, round, span, cap) =>
        taken += 1; b
    }
  }

  /** Train on a (vec_id, x: Array[Double]) DataFrame. */
  def train(data: DataFrame, cfg: Config = Config()): Model = {
    val sc = data.sparkSession.sparkContext
    val dis = mkDis(cfg)
    val gen = mkGen(cfg)
    var dP = dis.init(cfg.seed)
    var gP = gen.init(cfg.seed + 1)
    val rdd = data.select("x").rdd.map(_.getSeq[Double](0).toArray).cache()
    val span = estBatchesPerPart(rdd.count(), rdd.getNumPartitions, cfg.batchSize)

    for (round <- 0 until cfg.rounds) {
      val bcD = sc.broadcast(dP)
      val bcG = sc.broadcast(gP)
      // Each partition: local adversarial minibatch SGD from the broadcast
      // params; emit (localD, localG, nBatches) for the weighted average.
      val (sumD, sumG, n) = rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val d = bcD.value.clone()
          val g = bcG.value.clone()
          val rng = new java.util.Random(cfg.seed + round * 7919L + pid * 131L)
          var batches = 0L
          // stream fixed-size batches off the iterator — only one batch is
          // ever resident, not the whole partition; the rotating window
          // caps local steps per averaging round (Config.maxBatchesPerRound)
          roundBatchPicker(it.grouped(cfg.batchSize), round, span,
            cfg.maxBatchesPerRound).foreach { batch =>
            // --- discriminator step: real→realLabel, fake→(1−realLabel),
            // interleaved so sequential SGD carries no recency bias toward
            // either class.
            batch.foreach { x =>
              val (cd, o) = dis.fwd(d, x)
              dis.bwd(d, x, cd, Array(o(0) - cfg.realLabel), cfg.lrD, update = true)
              val z = Array.fill(cfg.zDim)(rng.nextDouble() * 2 - 1)
              val fake = gen.fwd(g, z)._2
              val (cf, of) = dis.fwd(d, fake)
              dis.bwd(d, fake, cf, Array(of(0) - (1.0 - cfg.realLabel)), cfg.lrD, update = true)
            }
            // --- generator step through the frozen discriminator, target 1
            // (one G step per two D samples, like the reference's 2:1
            // dis:gen data ratio, java :412-421 vs :463-466)
            for (_ <- 0 until (batch.length + 1) / 2) {
              val z = Array.fill(cfg.zDim)(rng.nextDouble() * 2 - 1)
              val (cg, fake) = gen.fwd(g, z)
              val (cd, o) = dis.fwd(d, fake)
              val dx = dis.bwd(d, fake, cd, Array(o(0) - 1.0), 0.0, update = false)
              // chain through the generator's sigmoid output
              val dOutG = new Array[Double](cfg.dataDim)
              var i = 0
              while (i < cfg.dataDim) {
                dOutG(i) = dx(i) * fake(i) * (1.0 - fake(i))
                i += 1
              }
              gen.bwd(g, z, cg, dOutG, cfg.lrG, update = true)
            }
            batches += 1
          }
          // weight the local params by batches processed
          var i = 0
          while (i < d.length) { d(i) *= batches; i += 1 }
          i = 0
          while (i < g.length) { g(i) *= batches; i += 1 }
          Iterator((d, g, batches))
        }
      }.treeAggregate((new Array[Double](dis.nParams), new Array[Double](gen.nParams), 0L))(
        seqOp = { case ((ad, ag, an), (d, g, nb)) => add(ad, d); add(ag, g); (ad, ag, an + nb) },
        combOp = { case ((ad, ag, an), (bd, bg, bn)) => add(ad, bd); add(ag, bg); (ad, ag, an + bn) },
        depth = 2)
      if (n > 0) {
        dP = sumD.map(_ / n)
        gP = sumG.map(_ / n)
      }
      bcD.destroy(); bcG.destroy()
    }
    Model(cfg, dP, gP)
  }

  private def add(a: Array[Double], b: Array[Double]): Unit = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
  }

  /** Per-batch GAN + classifier CO-TRAINING — the reference's loop trains
    * dis, gan, AND the transfer CV model inside the same batch iteration
    * (dl4jGANComputerVision.java:408-511), rather than fitting the head
    * after the GAN converges. Input rows are (vec_id, x, label); per
    * batch each partition runs the adversarial dis/gen steps and then a
    * softmax-head SGD step on the CURRENT discriminator's features; all
    * three parameter vectors are averaged in one treeAggregate.
    * Returns the GAN model plus the trained head (a linear-softmax layer
    * over the dis features, like the reference's dense+softmax head,
    * :337-364).
    */
  def trainCoTrained(data: DataFrame, nClasses: Int, cfg: Config = Config(),
      lrHead: Double = 0.05): (Model, Array[Double]) = {
    val sc = data.sparkSession.sparkContext
    val dis = mkDis(cfg)
    val gen = mkGen(cfg)
    val nFeat = {
      val probe = new Array[Double](cfg.dataDim)
      dis.features(dis.init(cfg.seed), probe).length
    }
    var dP = dis.init(cfg.seed)
    var gP = gen.init(cfg.seed + 1)
    var hP = new Array[Double](nFeat * nClasses + nClasses) // zero-init softmax head
    val rdd = data.select("x", "label").rdd
      .map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
      .cache()
    val span = estBatchesPerPart(rdd.count(), rdd.getNumPartitions, cfg.batchSize)

    for (round <- 0 until cfg.rounds) {
      val bcD = sc.broadcast(dP)
      val bcG = sc.broadcast(gP)
      val bcH = sc.broadcast(hP)
      val (sumD, sumG, sumH, n) = rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val d = bcD.value.clone()
          val g = bcG.value.clone()
          val h = bcH.value.clone()
          val rng = new java.util.Random(cfg.seed + round * 7919L + pid * 131L)
          var batches = 0L
          // rotating local-step window, same treatment as train
          roundBatchPicker(it.grouped(cfg.batchSize), round, span,
            cfg.maxBatchesPerRound).foreach { batch =>
            // adversarial steps (same as train)
            batch.foreach { case (x, _) =>
              val (cd, o) = dis.fwd(d, x)
              dis.bwd(d, x, cd, Array(o(0) - cfg.realLabel), cfg.lrD, update = true)
              val z = Array.fill(cfg.zDim)(rng.nextDouble() * 2 - 1)
              val fake = gen.fwd(g, z)._2
              val (cf, of) = dis.fwd(d, fake)
              dis.bwd(d, fake, cf, Array(of(0) - (1.0 - cfg.realLabel)), cfg.lrD, update = true)
            }
            for (_ <- 0 until (batch.length + 1) / 2) {
              val z = Array.fill(cfg.zDim)(rng.nextDouble() * 2 - 1)
              val (cg, fake) = gen.fwd(g, z)
              val (cd, o) = dis.fwd(d, fake)
              val dx = dis.bwd(d, fake, cd, Array(o(0) - 1.0), 0.0, update = false)
              val dOutG = new Array[Double](cfg.dataDim)
              var i = 0
              while (i < cfg.dataDim) { dOutG(i) = dx(i) * fake(i) * (1.0 - fake(i)); i += 1 }
              gen.bwd(g, z, cg, dOutG, cfg.lrG, update = true)
            }
            // classifier step on the CURRENT dis features (co-training)
            batch.foreach { case (x, label) =>
              val f = dis.features(d, x)
              val logits = new Array[Double](nClasses)
              var k = 0
              while (k < nClasses) {
                var a = h(nFeat * nClasses + k)
                var i = 0
                while (i < nFeat) { a += f(i) * h(i * nClasses + k); i += 1 }
                logits(k) = a
                k += 1
              }
              val mx = logits.max
              var zsum = 0.0
              k = 0
              while (k < nClasses) { logits(k) = math.exp(logits(k) - mx); zsum += logits(k); k += 1 }
              k = 0
              while (k < nClasses) {
                val dOut = logits(k) / zsum - (if (k == label) 1.0 else 0.0)
                h(nFeat * nClasses + k) -= lrHead * dOut
                var i = 0
                while (i < nFeat) { h(i * nClasses + k) -= lrHead * f(i) * dOut; i += 1 }
                k += 1
              }
            }
            batches += 1
          }
          var i = 0
          while (i < d.length) { d(i) *= batches; i += 1 }
          i = 0
          while (i < g.length) { g(i) *= batches; i += 1 }
          i = 0
          while (i < h.length) { h(i) *= batches; i += 1 }
          Iterator((d, g, h, batches))
        }
      }.treeAggregate((new Array[Double](dis.nParams), new Array[Double](gen.nParams),
        new Array[Double](nFeat * nClasses + nClasses), 0L))(
        seqOp = { case ((ad, ag, ah, an), (d, g, h, nb)) =>
          add(ad, d); add(ag, g); add(ah, h); (ad, ag, ah, an + nb) },
        combOp = { case ((ad, ag, ah, an), (bd, bg, bh, bn)) =>
          add(ad, bd); add(ag, bg); add(ah, bh); (ad, ag, ah, an + bn) },
        depth = 2)
      if (n > 0) {
        dP = sumD.map(_ / n)
        gP = sumG.map(_ / n)
        hP = sumH.map(_ / n)
      }
      bcD.destroy(); bcG.destroy(); bcH.destroy()
    }
    // Head-polish rounds: the co-trained head chased a MOVING feature
    // space — every averaging round changed the discriminator under it,
    // so the averaged head lags the final features (the lag grows with
    // corpus size: more local steps per round = bigger feature jumps;
    // the r9 sf1 checkpoint measured the co-trained head at ~chance
    // while q31's train-after LR head passed). Two head-only rounds
    // over the FROZEN final features close that gap — linear-softmax
    // SGD with O(nParams·partitions) sync like every other round, and
    // NO local-step cap: the cap guards nonconvex feature divergence,
    // while the frozen-feature head objective is convex — averaging
    // full-partition passes is safe and every row contributes.
    for (round <- cfg.rounds until cfg.rounds + 2) {
      val bcD = sc.broadcast(dP)
      val bcH = sc.broadcast(hP)
      val (sumH, n) = rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val d = bcD.value
          val h = bcH.value.clone()
          var batches = 0L
          it.grouped(cfg.batchSize).foreach { batch =>
            batch.foreach { case (x, label) =>
              val f = dis.features(d, x)
              val logits = new Array[Double](nClasses)
              var k = 0
              while (k < nClasses) {
                var a = h(nFeat * nClasses + k)
                var i = 0
                while (i < nFeat) { a += f(i) * h(i * nClasses + k); i += 1 }
                logits(k) = a
                k += 1
              }
              val mx = logits.max
              var zsum = 0.0
              k = 0
              while (k < nClasses) { logits(k) = math.exp(logits(k) - mx); zsum += logits(k); k += 1 }
              k = 0
              while (k < nClasses) {
                val dOut = logits(k) / zsum - (if (k == label) 1.0 else 0.0)
                h(nFeat * nClasses + k) -= lrHead * dOut
                var i = 0
                while (i < nFeat) { h(i * nClasses + k) -= lrHead * f(i) * dOut; i += 1 }
                k += 1
              }
            }
            batches += 1
          }
          var i = 0
          while (i < h.length) { h(i) *= batches; i += 1 }
          Iterator((h, batches))
        }
      }.treeAggregate((new Array[Double](nFeat * nClasses + nClasses), 0L))(
        seqOp = { case ((ah, an), (h, nb)) => add(ah, h); (ah, an + nb) },
        combOp = { case ((ah, an), (bh, bn)) => add(ah, bh); (ah, an + bn) },
        depth = 2)
      if (n > 0) hP = sumH.map(_ / n)
      bcD.destroy(); bcH.destroy()
    }
    (Model(cfg, dP, gP), hP)
  }

  /** Softmax-head prediction over a feature vector. */
  def headPredict(hP: Array[Double], f: Array[Double], nClasses: Int): Int = {
    val nFeat = f.length
    var best = 0
    var bestV = Double.NegativeInfinity
    var k = 0
    while (k < nClasses) {
      var a = hP(nFeat * nClasses + k)
      var i = 0
      while (i < nFeat) { a += f(i) * hP(i * nClasses + k); i += 1 }
      if (a > bestV) { bestV = a; best = k }
      k += 1
    }
    best
  }

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Config), (Model, DataFrame)]()
  graft.Memos.register { () => memo.values.forEach(v => v._2.unpersist()); memo.clear() }

  /** Train on the sf `embeddings` table, min-max scaled. Memoized per
    * (session, dir, config): the catalog's feature/generate/classify
    * queries share one trained model instead of re-running the
    * adversarial loop. The session instance is part of the key (reference
    * equality) so a new session never receives a cached DataFrame bound
    * to a stopped one.
    */
  def trainOnEmbeddings(s: SparkSession, dir: String, cfg: Config = Config()): (Model, DataFrame) =
    memo.computeIfAbsent((s, dir, cfg), { _ =>
      val data = scaled01(Tables.embeddings(s, dir), cfg.dataDim).cache()
      (train(data, cfg), data)
    })
}
