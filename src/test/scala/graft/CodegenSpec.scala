package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

class CodegenSpec extends SparkSpec {

  test("CosineSim runs under codegen with fallback disabled") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Tables.embeddings(spark, sfDir)
        .select(VectorExprs.cosineSim(col("embedding"),
          typedlit(Array.tabulate(64)(i => (i + 1).toDouble / 64))).as("c"))
      // would throw if the generated code failed to compile
      val n = df.filter(col("c").isNotNull).count()
      assert(n > 0)
      // WSCG renders as a `*(stageId)` prefix in the simple plan string
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1) Project"), s"expected WSCG-starred Project in:\n$plan")
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("generated-loop expressions execute inside a WSCG project") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Tables.documents(spark, sfDir)
        .select(
          VectorExprs.charNgrams(col("text"), 3).as("g"),
          VectorExprs.simHash64(split(trim(col("text")), "\\s+")).as("sh"),
          VectorExprs.minHashSig(col("text")).as("mh"),
          VectorExprs.polyHash(col("text")).as("ph"),
          VectorExprs.minWindowHash(col("text"), 16).as("mw"))
      assert(df.collect().nonEmpty)
      assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("codegen and interpreted eval agree for the text-hash expressions") {
    import graft.functions.{CharNgrams, MinHashSig, MinWindowHash, PolyHash, SimHash64}
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.ArrayData
    // interpreted results computed directly via compute(); codegen results
    // via a WSCG query with fallback disabled (previous test) — here we
    // cross-check a handful of tricky strings through BOTH paths.
    val samples = Seq("", "a", "short", "héllo wörld çafé", // multi-byte UTF-8
      "the quick brown fox jumps over the lazy dog and keeps running onwards")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val df = samples.toDF("t").select(
        col("t"),
        VectorExprs.polyHash(col("t")).as("ph"),
        VectorExprs.minWindowHash(col("t"), 16).as("mw"),
        VectorExprs.minHashSig(col("t")).as("mh"),
        VectorExprs.charNgrams(col("t"), 3).as("ng"))
      val rows = df.collect().map(r => r.getAs[String]("t") -> r).toMap
      samples.foreach { s0 =>
        val u = UTF8String.fromString(s0)
        val r = rows(s0)
        assert(r.getAs[Long]("ph") == PolyHash(null).compute(u), s"polyHash '$s0'")
        assert(r.getAs[Long]("mw") == MinWindowHash(null, 16).compute(u), s"minWindowHash '$s0'")
        val mhInterp = MinHashSig(null, 5, 16).compute(u)
          .toLongArray().toSeq
        assert(r.getSeq[Long](r.fieldIndex("mh")) == mhInterp, s"minHashSig '$s0'")
        val ngInterp = CharNgrams(null, 3).compute(u)
          .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
        assert(r.getSeq[String](r.fieldIndex("ng")) == ngInterp, s"charNgrams '$s0'")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("BpeTokenCount: codegen and interpreted agree, incl quote/merge-chain cases") {
    import graft.functions.BpeTokenCount
    // merges: (a,b)->ab then (ab,c)->abc — exercises chained merges; the
    // quote merge exercises referenced-object strings that would break a
    // naive SQL-literal embedding
    val merges = Array("a", "b", "ab", "ab", "c", "abc", "'", "'", "''")
    val samples = Seq("", "abc", "ab c abc", "a b a", "'' ' ''", "  ab\tabc\nx  ")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val rows = samples.toDF("t")
        .select(col("t"), VectorExprs.bpeTokenCount(col("t"), merges).as("n"))
        .collect().map(r => r.getAs[String]("t") -> r.getAs[Int]("n")).toMap
      samples.foreach { s0 =>
        assert(rows(s0) == BpeTokenCount.count(s0, merges), s"'$s0'")
      }
      // hand-checked: "abc" folds a,b->ab then ab,c->abc = 1 symbol
      assert(rows("abc") == 1)
      assert(rows("ab c abc") == 1 + 1 + 1)
      assert(rows("a b a") == 3)
      assert(rows("'' ' ''") == 1 + 1 + 1)
      assert(rows("") == 0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("BpeEncodeIds: codegen == driver encode, ids index the vocab, OOV = -1") {
    import graft.functions.{BpeEncodeIds, BpeTokenCount}
    val merges = Array("a", "b", "ab", "ab", "c", "abc")
    // alphabet {a,b,c} ids 0-2, merged types ab=3, abc=4; 'x' is OOV
    val vocab = Array("a", "b", "c", "ab", "abc")
    val samples = Seq("", "abc", "ab c abc", "a b a", "abc x c")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val rows = samples.toDF("t")
        .select(col("t"),
          VectorExprs.bpeEncodeIds(col("t"), merges, vocab).as("ids"))
        .collect().map(r => r.getAs[String]("t") -> r.getSeq[Int](1)).toMap
      val idMap = BpeEncodeIds.buildIdMap(vocab)
      samples.foreach { s0 =>
        assert(rows(s0) == BpeTokenCount.encodeIds(s0, merges, idMap).toSeq,
          s"'$s0'")
        assert(rows(s0).length == BpeTokenCount.count(s0, merges),
          s"id count must equal token count for '$s0'")
      }
      assert(rows("abc") == Seq(4))
      assert(rows("ab c abc") == Seq(3, 2, 4))
      assert(rows("a b a") == Seq(0, 1, 0))
      assert(rows("abc x c") == Seq(4, -1, 2), "unknown symbol must emit -1")
      assert(rows("") == Seq.empty)
      // SQL surface: same result through the registered function
      graft.plans.GraftExtensions.register(spark)
      val sqlIds = spark.sql(
        "SELECT bpe_encode_ids('ab c abc', array('a','b','ab','ab','c','abc'), " +
          "array('a','b','c','ab','abc')) ids").head.getSeq[Int](0)
      assert(sqlIds == Seq(3, 2, 4))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("AdcScore: codegen and interpreted agree, runs inside WSCG") {
    import graft.functions.AdcScore
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val nSub = 8
    val nCodes = 16
    val table = Array.tabulate(nSub * nCodes)(i => math.sin(i) * 0.5 + 0.5)
    val codeRows = Seq(Seq(0, 1, 2, 3, 4, 5, 6, 7), Seq(15, 14, 0, 7, 3, 9, 11, 2))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      // repartition blocks ConvertToLocalRelation from folding the
      // projection at plan time — the expression must run executor-side
      val df = codeRows.toDF("codes").repartition(1)
        .select(col("codes"), VectorExprs.adcScore(col("codes"), table, nSub, nCodes).as("adc"))
      assert(df.queryExecution.executedPlan.toString.contains("Project"))
      val got = df.collect().map(r => r.getSeq[Int](0) -> r.getDouble(1)).toMap
      codeRows.foreach { cs =>
        val interp = AdcScore(null, table, nSub, nCodes)
          .compute(new GenericArrayData(cs.toArray))
        assert(got(cs) == interp, s"ADC diverged for $cs")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("PqEncode: codegen and interpreted agree, encodes like a hand argmin") {
    import graft.functions.PqEncode
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val nSub = 4
    val nCodes = 5
    val subDim = 4
    // deterministic codebooks, laid out [(sub*nCodes + code)*subDim + i]
    val books = Array.tabulate(nSub * nCodes * subDim)(i =>
      math.cos(i * 0.7) * 0.4)
    val vecs = Seq(
      Array.tabulate(16)(i => (i % 7 - 3).toFloat / 3f),
      Array.tabulate(16)(i => math.sin(i).toFloat))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val df = vecs.map(_.toSeq).toDF("embedding").repartition(1)
        .select(col("embedding"),
          VectorExprs.pqEncode(col("embedding"), books, nSub, nCodes, subDim).as("codes"))
      assert(df.queryExecution.executedPlan.toString.contains("Project"))
      val got = df.collect().map(r => r.getSeq[Float](0) -> r.getSeq[Int](1)).toMap
      vecs.foreach { v =>
        val interp = PqEncode(null, books, nSub, nCodes, subDim)
          .compute(new GenericArrayData(v)).toIntArray().toSeq
        assert(got(v.toSeq) == interp, s"PqEncode codegen diverged for ${v.toSeq}")
        // independent hand argmin over the normalized vector
        val inv = 1.0 / math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
        val hand = (0 until nSub).map { sub =>
          (0 until nCodes).minBy { c =>
            (0 until subDim).map { i =>
              val dd = v(sub * subDim + i) * inv - books((sub * nCodes + c) * subDim + i)
              dd * dd
            }.sum
          }
        }
        assert(interp == hand, s"PqEncode argmin wrong for ${v.toSeq}")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("round-8 expressions run under WSCG; codegen == interpreted == reference") {
    import graft.functions.{DeflateLen, InterCount}
    import org.apache.spark.unsafe.types.UTF8String
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import spark.implicits._
      val samples = Seq("", "a", "spark " * 50, "héllo wörld çafé — ünïcode",
        "mixed ascii and ünïcödé text with some repetition repetition repetition")
      // WSCG coverage over a real scan (a literal frame constant-folds
      // to a LocalTableScan and never exercises the generated path)
      val wscg = Tables.documents(spark, sfDir).select(
        VectorExprs.deflateLen(col("text")).as("dl"),
        VectorExprs.interCountSorted(
          sort_array(array_distinct(VectorExprs.charNgrams(col("text"), 2))),
          typedlit(Array("ab", "ar", "pe", "rk", "ti"))).as("ic"))
      assert(wscg.queryExecution.executedPlan.toString.contains("*(1) Project"))
      assert(wscg.collect().nonEmpty)
      val df = samples.toDF("t").select(col("t"),
        VectorExprs.deflateLen(col("t")).as("dl"),
        VectorExprs.interCountSorted(
          sort_array(array_distinct(VectorExprs.charNgrams(col("t"), 2))),
          typedlit(Array("ab", "ar", "pe", "rk", "ti"))).as("ic"))
      val rows = df.collect().map(r => r.getAs[String]("t") -> r).toMap
      samples.foreach { s0 =>
        val r = rows(s0)
        // codegen (query) vs interpreted (compute) vs an independent
        // java.util.zip reference for the byte length
        assert(r.getAs[Int]("dl") ==
          DeflateLen(null).compute(UTF8String.fromString(s0)), s"deflate '$s0'")
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(s0.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](s0.getBytes("UTF-8").length + 64)
        var ref = 0
        while (!d.finished()) ref += d.deflate(buf)
        d.end()
        assert(r.getAs[Int]("dl") == ref, s"deflate ref '$s0'")
        // intersection against the dense set computation
        val grams = (if (s0.length < 2) Seq.empty
          else (0 to s0.length - 2).map(i => s0.substring(i, i + 2))).distinct.toSet
        val want = grams.intersect(Set("ab", "ar", "pe", "rk", "ti")).size
        assert(r.getAs[Int]("ic") == want, s"interCount '$s0'")
      }
      // MahalanobisSq / WhitenProject: codegen path vs direct compute on
      // the real embeddings (float arrays; multi-byte concerns don't
      // apply, reference-object codegen does)
      val m = ml.Whitening.model(spark, sfDir)
      val scored = Tables.embeddings(spark, sfDir).limit(16)
        .select(col("vec_id"), col("embedding"),
          VectorExprs.mahalanobisSq(col("embedding"), m.mean, m.cinv).as("d2"),
          VectorExprs.whitenProject(col("embedding"), m.mean, m.wrows, m.k).as("w"))
      assert(scored.queryExecution.executedPlan.toString.contains("*(1) Project"))
      scored.collect().foreach { r =>
        val x = r.getSeq[Float](1).toArray
        val diff = x.map(_.toDouble).zip(m.mean).map { case (a, b) => a - b }
        var acc = 0.0
        for (j <- 0 until m.dim) {
          var dot = 0.0
          for (i <- 0 until m.dim) dot += m.cinv(j * m.dim + i) * diff(i)
          acc += diff(j) * dot
        }
        assert(math.abs(r.getAs[Double]("d2") - acc) < 1e-9,
          s"vec ${r.getLong(0)} maha")
        val w = r.getSeq[Double](3)
        for (j <- 0 until m.k) {
          var dot = 0.0
          for (i <- 0 until m.dim) dot += m.wrows(j * m.dim + i) * diff(i)
          assert(math.abs(w(j) - dot) < 1e-9, s"vec ${r.getLong(0)} w$j")
        }
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
