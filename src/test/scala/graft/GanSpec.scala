package graft

import graft.ml.Gan

class GanSpec extends SparkSpec {

  test("training is deterministic and parameters stay finite") {
    val cfg = Gan.Config(rounds = 2)
    val (m1, _) = Gan.trainOnEmbeddings(spark, sfDir, cfg)
    val (m2, _) = Gan.trainOnEmbeddings(spark, sfDir, cfg)
    assert(m1.dParams.toSeq == m2.dParams.toSeq, "dis params not deterministic")
    assert(m1.gParams.toSeq == m2.gParams.toSeq, "gen params not deterministic")
    assert(m1.dParams.forall(p => !p.isNaN && !p.isInfinite))
    assert(m1.gParams.forall(p => !p.isNaN && !p.isInfinite))
  }

  test("discriminator separates real from generated after training") {
    val (model, data) = Gan.trainOnEmbeddings(spark, sfDir, Gan.Config(rounds = 4))
    val reals = data.limit(100).collect().map(_.getSeq[Double](1).toArray)
    val realScore = reals.map(model.disScore).sum / reals.length
    val rng = new java.util.Random(1)
    val fakes = Array.fill(100)(model.generate(Array.fill(model.cfg.zDim)(rng.nextDouble() * 2 - 1)))
    val fakeScore = fakes.map(model.disScore).sum / fakes.length
    assert(realScore > fakeScore,
      s"real avg $realScore should exceed fake avg $fakeScore")
    assert(fakes.forall(_.forall(v => v >= 0.0 && v <= 1.0)), "generator range [0,1]")
  }

  test("conv GAN trains deterministically and separates real from generated") {
    val cfg = Gan.Config(rounds = 3, arch = "conv")
    val (m1, data) = Gan.trainOnEmbeddings(spark, sfDir, cfg)
    val (m2, _) = Gan.trainOnEmbeddings(spark, sfDir, cfg)
    assert(m1.dParams.toSeq == m2.dParams.toSeq, "conv dis params not deterministic")
    assert(m1.dParams.forall(p => !p.isNaN && !p.isInfinite))
    assert(m1.gParams.forall(p => !p.isNaN && !p.isInfinite))
    val reals = data.limit(100).collect().map(_.getSeq[Double](1).toArray)
    val realScore = reals.map(m1.disScore).sum / reals.length
    val rng = new java.util.Random(1)
    val fakes = Array.fill(100)(m1.generate(Array.fill(m1.cfg.zDim)(rng.nextDouble() * 2 - 1)))
    val fakeScore = fakes.map(m1.disScore).sum / fakes.length
    assert(realScore > fakeScore, s"conv: real avg $realScore should exceed fake avg $fakeScore")
    assert(fakes.forall(_.forall(v => v >= 0.0 && v <= 1.0)), "conv generator range [0,1]")
    // the conv discriminator's feature vector is the 32-d pooled map
    assert(m1.disFeatures(reals.head).length == 32)
  }

  test("co-trained head: finite params, deterministic, beats the uniform prior") {
    val rows = ml.GanQueries.q37.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val acc = rows.map(_.getAs[Int]("correct")).sum.toDouble / rows.length
    assert(acc > 0.11, s"co-trained accuracy $acc not above the 10-class prior")
    val again = ml.GanQueries.q37.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("prediction")).toSeq ==
      again.map(_.getAs[Int]("prediction")).toSeq, "co-training not deterministic")
  }

  test("scaled01 maps every dimension into [0,1]") {
    val scaled = Gan.scaled01(Tables.embeddings(spark, sfDir), 64)
    val rows = scaled.collect().map(_.getSeq[Double](1))
    assert(rows.nonEmpty)
    assert(rows.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
  }
}
