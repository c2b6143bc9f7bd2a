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

  // factor > 10: decade blocks must bound near-dup cluster size at ~10
  // members — within a block replicas stay near-dups (the sf1 density),
  // across blocks both the text and the vectors fall below every
  // near-dup gate in the engine (3-gram Jaccard ≪ 0.5, cosine < 0.99).
  private lazy val blockDir = {
    val d = java.nio.file.Files.createTempDirectory("scaleup-blocks").toString
    ScaleUp.run(spark, sfDir, d, 12)
    d
  }

  test("factor>10 decade blocks: same-block texts stay near-dups, cross-block don't") {
    def grams(t: String): Set[String] =
      (0 to t.length - 3).map(i => t.substring(i, i + 3)).toSet
    val texts = spark.read.parquet(s"$blockDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baseIds = base("documents").select("doc_id").collect().map(_.getLong(0)).take(10)
    def jac(a: String, b: String): Double = {
      val (ga, gb) = (grams(a), grams(b))
      (ga & gb).size.toDouble / (ga | gb).size
    }
    baseIds.foreach { id =>
      val sameBlock0 = jac(texts(id), texts(id + 10000000L)) // rep 0 vs rep 1
      val sameBlock1 = jac(texts(id + 100000000L), texts(id + 110000000L)) // rep 10 vs 11
      val crossBlock = jac(texts(id), texts(id + 110000000L)) // rep 0 vs rep 11
      assert(sameBlock0 > 0.8, s"doc $id block-0 jaccard $sameBlock0")
      assert(sameBlock1 > 0.8, s"doc $id block-1 jaccard $sameBlock1")
      assert(crossBlock < 0.5, s"doc $id cross-block jaccard $crossBlock")
    }
    // the n_chars contract survives the block mutation
    assert(spark.read.parquet(s"$blockDir/documents.parquet")
      .filter(length(col("text")).cast("long") =!= col("n_chars")).count() == 0)
  }

  test("factor>10 decade blocks: same-block vectors stay cosine-dups, cross-block don't") {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val embs = spark.read.parquet(s"$blockDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val baseIds = base("embeddings").select("vec_id").collect().map(_.getLong(0)).take(10)
    baseIds.foreach { id =>
      val sameBlock = cos(embs(id), embs(id + 10000000L))
      val crossBlock = cos(embs(id), embs(id + 110000000L))
      assert(sameBlock > 0.995, s"vec $id same-block cos $sameBlock")
      assert(crossBlock < 0.99, s"vec $id cross-block cos $crossBlock")
    }
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
