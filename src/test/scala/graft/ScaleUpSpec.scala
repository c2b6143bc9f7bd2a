package graft

import org.apache.spark.sql.functions._

/** The scale-checkpoint corpus generator must itself be trustworthy:
  * every invariant the sf1 experiment leans on is asserted here on a
  * factor-3 expansion of sf0.001.
  */
class ScaleUpSpec extends SparkSpec {

  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("scaleup-spec").toString
    ScaleUp.run(spark, sfDir, d, 3)
    d
  }
  private def gen(t: String) = spark.read.parquet(s"$outDir/$t.parquet")
  private def base(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")

  test("row counts scale by the factor; bounded dims don't") {
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(gen(t).count() == 3 * base(t).count(), s"table $t")
    for (t <- Seq("region", "nation"))
      assert(gen(t).count() == base(t).count(), s"table $t")
  }

  test("replica 0 is the original, byte-identical") {
    val orig = base("orders")
    val rep0 = gen("orders").filter(col("o_orderkey") < 10000000L)
    assert(rep0.count() == orig.count())
    assert(rep0.exceptAll(orig).count() == 0)
  }

  test("join relationships survive per replica") {
    // every lineitem still finds its order, in every replica
    val dangling = gen("lineitem").join(gen("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    assert(dangling.count() == 0)
  }

  test("documents keep the n_chars contract and exact-dup groups stay intra-replica") {
    assert(gen("documents")
      .filter(length(col("text")).cast("long") =!= col("n_chars")).count() == 0)
    // a text value occurring in 2+ docs must come from ONE replica —
    // cross-replica texts differ by the ' r<rep>' suffix by construction
    val crossReplicaDups = gen("documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(countDistinct(floor(col("doc_id") / 10000000L)).as("n_reps"))
      .filter(col("n_reps") > 1)
    assert(crossReplicaDups.count() == 0)
  }

  test("embedding perturbation is bounded and breaks exact ties") {
    val joined = gen("embeddings").filter(col("vec_id") >= 10000000L)
      .withColumn("base_id", col("vec_id") % 10000000L)
      .select(col("base_id"), col("embedding").as("e2"))
      .join(base("embeddings").select(col("vec_id").as("base_id"),
        col("embedding").as("e1")), "base_id")
    val stats = joined.select(
      max(expr("aggregate(zip_with(e1, e2, (a, b) -> abs(a - b)), " +
        "cast(0.0 as double), (acc, x) -> greatest(acc, x))")).as("max_dev"),
      sum(expr("if(e1 = e2, 1, 0)")).as("identical")).collect()(0)
    // the ±0.005 bound is computed in FLOAT on the Spark side — allow a
    // single-ulp-of-float slack
    assert(stats.getDouble(0) <= 0.005 + 1e-6, s"perturbation too large: ${stats.getDouble(0)}")
    assert(stats.getLong(1) == 0, "replica vectors must not tie exactly with base")
  }
}
