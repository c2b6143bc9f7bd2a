package graft

class CatalogSpec extends SparkSpec {

  test("catalog names are unique and oracle keys are query keys") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every catalog query runs and returns rows at sf0.001") {
    val failures = SparkEntry.catalog.flatMap { q =>
      try {
        val n = q.fn(spark, sfDir).count()
        if (n > 0) None else Some(s"${q.name}: 0 rows")
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("q01 golden invariants") {
    val rows = operators.Relational.q01.fn(spark, sfDir).collect()
    assert(rows.length > 0)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val li = Tables.lineitem(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "2000-12-01")
    assert(total == li.count())
  }

  test("q40 exact dedup covers every document exactly once") {
    val out = dedup.Dedup.q40.fn(spark, sfDir)
    import org.apache.spark.sql.functions._
    val copies = out.agg(sum("n_copies")).head.getLong(0)
    assert(copies == Tables.documents(spark, sfDir).count())
  }

  test("q49 substring-dup fractions are consistent and exact copies score 1.0") {
    import org.apache.spark.sql.functions._
    val out = dedup.Dedup.q49.fn(spark, sfDir).cache()
    assert(out.filter(col("n_dup_grams") > col("n_grams")).isEmpty)
    assert(out.filter(col("dup_frac") < 0 || col("dup_frac") > 1).isEmpty)
    // q40's duplicate groups are byte-identical docs, so every gram of a
    // long-enough exact copy is shared: dup_frac must be exactly 1.0 there.
    val dupHashes = dedup.Dedup.q40.fn(spark, sfDir)
      .filter(col("n_copies") > 1).select("h")
    val copies = Tables.documents(spark, sfDir)
      .withColumn("h", md5(col("text")))
      .join(dupHashes, "h")
      .filter(length(col("text")) >= 50)
      .select("doc_id")
    val mismatch = out.join(copies, "doc_id").filter(col("dup_frac") =!= 1.0)
    assert(mismatch.isEmpty)
    out.unpersist()
  }
}
