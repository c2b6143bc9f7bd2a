package graft

import org.apache.spark.sql.functions._

/** The persisted text inverted index: probe parity vs a direct corpus
  * scan, and the partition-pruning contract (a probe must read only its
  * terms' hash-bucket partitions, never the corpus).
  */
class InvertedIndexSpec extends SparkSpec {

  test("conjunctive probe equals a direct corpus scan, including tf sums") {
    val terms = Seq("spark", "join", "window")
    val got = text.TextAnalysis.probeConjunctive(spark, sfDir, terms)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val expect = docs.flatMap { case (id, toks) =>
      val counts = terms.map(t => toks.count(_ == t).toLong)
      if (counts.forall(_ > 0)) Some(id -> counts.sum) else None
    }.toMap
    assert(got == expect, s"probe diverges: got ${got.size} docs, expect ${expect.size}")
    assert(expect.nonEmpty, "probe terms must actually co-occur in this corpus")
  }

  test("the probe scan prunes to the probe terms' bucket partitions") {
    val terms = Seq("spark", "merge")
    val plan = text.TextAnalysis.probeConjunctive(spark, sfDir, terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")
    // the index table scan must carry the tb IN (...) partition predicate
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(plan).isDefined,
      s"tb partition predicate not pushed:\n$plan")
    // single-term degenerate probe
    val one = text.TextAnalysis.probeConjunctive(spark, sfDir, Seq("spark"))
      .collect()
    val direct = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .collect().count(_.getSeq[String](1).contains("spark"))
    assert(one.length == direct)
  }

  test("incremental append: probe over old+new equals a one-shot rebuild") {
    import spark.implicits._
    val table = text.TextAnalysis.invertedIndexTable(spark, sfDir)
    val before = text.TextAnalysis
      .probeConjunctive(spark, sfDir, Seq("spark", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // two synthetic docs: one matches the probe, one must not
    val batch = Seq(
      (900001L, "spark join spark window"),
      (900002L, "merge sort only")).toDF("doc_id", "text")
    text.TextAnalysis.appendToInvertedIndex(spark, table, batch)
    try {
      val after = text.TextAnalysis
        .probeConjunctive(spark, sfDir, Seq("spark", "join"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == before + ((900001L, 3L)),
        s"append must add exactly the matching new doc: ${after.diff(before)}")
    } finally {
      // restore the shared memoized table for other suites: an
      // overwrite rebuild from the pristine corpus (same table name,
      // memo stays valid)
      text.TextAnalysis.writeInvertedIndex(spark, sfDir, table)
    }
  }
}
