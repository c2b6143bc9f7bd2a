package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.sql.functions._
import graft.ml.{ArrayMinMaxScaler, ArrayToVector, GanFeatureEstimator}

/** End-to-end MLlib Pipeline composition: scale → GAN features → vector
  * bridge → softmax transfer head (the reference's sklearn-Pipeline
  * shape, gan.ipynb cell 2, re-expressed as PipelineStages).
  */
class PipelineSpec extends SparkSpec {

  test("scale -> GAN features -> transfer head fits and transforms end-to-end") {
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("x", col("embedding").cast("array<double>"))
    val pipe = new Pipeline().setStages(Array(
      new ArrayMinMaxScaler().setInputCol("x").setOutputCol("xs"),
      new GanFeatureEstimator().setInputCol("xs").setOutputCol("feats"),
      new ArrayToVector().setInputCol("feats").setOutputCol("fvec"),
      new LogisticRegression()
        .setFeaturesCol("fvec").setLabelCol("label")
        .setFamily("multinomial").setMaxIter(10).setRegParam(0.01)))
    val model = pipe.fit(emb)
    val out = model.transform(emb).cache()

    assert(out.columns.contains("prediction"))
    val n = out.count()
    assert(n == emb.count())

    // scaled stage output is inside [0,1]
    val mm = out.select(expr("aggregate(xs, 0D, (a, v) -> greatest(a, abs(v - 0.5)))").as("dev"))
      .agg(max("dev")).head.getDouble(0)
    assert(mm <= 0.5 + 1e-9, s"scaled values outside [0,1]: max dev $mm")

    // the learned head beats the 10-class uniform prior on its own train set
    val acc = out.select(avg((col("label") === col("prediction").cast("int")).cast("double")))
      .head.getDouble(0)
    assert(acc > 0.15, s"train accuracy $acc not better than prior")

    // stages are reusable: transforming a second time is deterministic
    val again = model.transform(emb)
    val a1 = out.select(sum(col("prediction"))).head.getDouble(0)
    val a2 = again.select(sum(col("prediction"))).head.getDouble(0)
    assert(a1 == a2)
  }
}
