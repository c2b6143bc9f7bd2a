package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.ml.{Gan, ModelIO}
import graft.plans.GraftExtensions
import graft.sources.MatrixSource

class FunctionsSpec extends SparkSpec {

  test("CosineSim matches the HOF formulation and handles float×double") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(0.5, 0.5, 1.0))).toDF("a", "b")
    val native = df.select(VectorExprs.cosineSim(col("a"), col("b"))).head.getDouble(0)
    val hof = df.select(
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * y), 0D, (acc, x) -> acc + x)") /
        (expr("sqrt(aggregate(a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))") *
          expr("sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x))"))).head.getDouble(0)
    assert(math.abs(native - hof) < 1e-15)
    assert(math.abs(native - 2.5 / (math.sqrt(5.0) * math.sqrt(1.5))) < 1e-15)
  }

  test("JaccardSim is set-based") {
    import spark.implicits._
    val df = Seq((Array("a", "b", "c"), Array("b", "c", "d"))).toDF("a", "b")
    val j = df.select(VectorExprs.jaccardSim(col("a"), col("b"))).head.getDouble(0)
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("CharNgrams produces sliding n-grams") {
    import spark.implicits._
    val out = Seq("abcde").toDF("t")
      .select(VectorExprs.charNgrams(col("t"), 3)).head.getSeq[String](0)
    assert(out == Seq("abc", "bcd", "cde"))
  }

  test("SQL registration exposes the native functions") {
    GraftExtensions.register(spark)
    val cos = spark.sql("SELECT cosine_sim(array(1.0, 0.0), array(1.0, 0.0)) c").head.getDouble(0)
    assert(cos == 1.0)
    val grams = spark.sql("SELECT char_ngrams('abcd', 2) g").head.getSeq[String](0)
    assert(grams == Seq("ab", "bc", "cd"))
    assert(spark.sql("SELECT simhash64(array('x','y')) s").head.getLong(0) != 0L)
    assert(spark.sql("SELECT minhash_sig('hello world!', 5, 16) m").head.getSeq[Long](0).size == 16)
    assert(spark.sql("SELECT dot_product(array(2.0, 3.0), array(4.0, 5.0)) d").head.getDouble(0) == 23.0)
    assert(spark.sql("SELECT poly_hash('ab') p").head.getLong(0) == ('a'.toLong * 131 + 'b') % 1000000007L)
    assert(spark.sql("SELECT min_window_hash('abcdef', 3) w").head.getLong(0) >= 0L)
    // PQ codecs: 1 subspace, 2 codes of dim 2 — the normalized vector
    // (1,0) is nearer code 0 = (1,0) than code 1 = (0,1)
    assert(spark.sql("SELECT pq_encode(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(1.0, 0.0, 0.0, 1.0), 1, 2, 2) c").head.getSeq[Int](0) == Seq(0))
    assert(spark.sql("SELECT adc_score(array(1), array(0.5, 2.5), 1, 2) a")
      .head.getDouble(0) == 2.5)
    // in-row ADC of the unit query (1,0) vs code 0 = (1,0): distance 0
    assert(spark.sql("SELECT adc_score_vec(array(1.0, 0.0), array(0), " +
      "array(1.0, 0.0, 0.0, 1.0), 1, 2, 2) v").head.getDouble(0) == 0.0)
    // BPE count under merges (a,b)->ab, (ab,c)->abc: 'abc ab x' -> 1+1+1
    assert(spark.sql("SELECT bpe_token_count('abc ab x', " +
      "array('a','b','ab', 'ab','c','abc')) n").head.getInt(0) == 3)
    // DEFLATE length: deterministic, positive, repetition compresses
    val dl = spark.sql(
      "SELECT deflate_len(repeat('spark ', 100)) a, deflate_len('spark') b").head
    assert(dl.getInt(0) > 0 && dl.getInt(0) < 60, s"repetitive deflate ${dl.getInt(0)}")
    assert(dl.getInt(1) > 0)
    // sorted-array intersection count
    assert(spark.sql(
      "SELECT inter_count(array('a','b','c'), array('b','c','d')) i").head.getInt(0) == 2)
  }

  test("bpe_token_count rejects malformed merge tables at analysis, not per row") {
    // ragged table (not a multiple of 3)
    val ragged = intercept[Exception] {
      spark.sql("SELECT bpe_token_count('x', array('a','b')) n").collect()
    }
    assert(ragged.getMessage.contains("triples"), ragged.getMessage)
    // non-foldable table argument
    val nonConst = intercept[Exception] {
      Tables.documents(spark, sfDir)
        .selectExpr("bpe_token_count(text, array(text, text, text)) n").collect()
    }
    assert(nonConst.getMessage.contains("constant"), nonConst.getMessage)
    // NULL table
    val nul = intercept[Exception] {
      spark.sql("SELECT bpe_token_count('x', CAST(NULL AS ARRAY<STRING>)) n").collect()
    }
    assert(nul.getMessage.contains("NULL"), nul.getMessage)
  }

  test("csv matrix roundtrip (reference's mnist csv interchange)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = Seq((Array(0.1, 0.2, 0.3), 1.0), (Array(0.4, 0.5, 0.6), 0.0))
      .toDF("features", "label")
    MatrixSource.writeCsvMatrix(df, 3, s"$dir/m.csv")
    val back = MatrixSource.readCsvMatrix(spark, s"$dir/m.csv", 3)
      .collect().map(r => (r.getSeq[Double](0), r.getDouble(1))).sortBy(_._2)
    assert(back.toSeq == Seq((Seq(0.4, 0.5, 0.6), 0.0), (Seq(0.1, 0.2, 0.3), 1.0)))
  }

  test("model save/load roundtrip preserves generation") {
    val (model, _) = Gan.trainOnEmbeddings(spark, sfDir, Gan.Config(rounds = 1))
    val path = java.nio.file.Files.createTempDirectory("graft-model").toString + "/gan.bin"
    ModelIO.save(model, path)
    val loaded = ModelIO.load(path)
    assert(loaded.dParams.toSeq == model.dParams.toSeq)
    val z = Array.fill(model.cfg.zDim)(0.3)
    assert(loaded.generate(z).toSeq == model.generate(z).toSeq)
  }
}
