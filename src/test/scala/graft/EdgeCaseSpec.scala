package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.ml.Gan
import graft.multimodal.Binary

class EdgeCaseSpec extends SparkSpec {

  test("CosineSim handles nulls and length mismatch gracefully") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0, 2.0, 3.0))), // length mismatch → min length
      (None, Some(Array(1.0, 2.0))))                          // null → null
      .toDF("a", "b")
    val out = df.select(VectorExprs.cosineSim(col("a"), col("b"))).collect()
    assert(!out(0).isNullAt(0)) // computed over the common prefix
    assert(out(1).isNullAt(0))
  }

  test("CharNgrams of short/empty strings is empty, not an error") {
    import spark.implicits._
    val out = Seq("", "ab").toDF("t")
      .select(VectorExprs.charNgrams(col("t"), 3)).collect()
    assert(out.forall(_.getSeq[String](0).isEmpty))
  }

  test("decodeStub: empty payload yields finite features") {
    val f = Binary.decodeStub(Array.emptyByteArray)
    assert(f.length == 8 && f.forall(v => !v.isNaN && !v.isInfinite))
    val g = Binary.decodeStub("hello".getBytes)
    assert(math.abs(g.sum - 1.0) < 1e-9) // histogram normalizes to 1
  }

  test("GAN trains on a single-partition dataset (degenerate parallelism)") {
    import spark.implicits._
    val rng = new java.util.Random(5)
    val tiny = (0 until 40).map(i => (i.toLong, Array.fill(64)(rng.nextDouble())))
      .toDF("vec_id", "x").repartition(1)
    val model = Gan.train(tiny, Gan.Config(rounds = 1, batchSize = 16))
    assert(model.dParams.forall(p => !p.isNaN))
    assert(model.generate(new Array[Double](8)).forall(v => v >= 0 && v <= 1))
  }

  test("sessionize (q13) and funnel (q92) agree on event totals") {
    val sessions = operators.Relational.q13.fn(spark, sfDir)
    val totalEvents = sessions.agg(sum("n_events")).head.getLong(0)
    assert(totalEvents == Tables.events(spark, sfDir).count())
  }
}
