package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** The Bloom-filter decontamination path (q75 + contaminationFlags):
  * the approximate set-membership plan must never lose a true hit
  * (no false negatives by Bloom construction), keep false positives
  * near zero at test scale, and probe without joining the corpus.
  */
class BloomDecontaminateSpec extends SparkSpec {

  private def exactIds: Set[Long] =
    Dedup.q47.fn(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("q75 bloom hits are a superset of exact q47 hits, with ~zero FPs") {
    val exact = exactIds
    val bloomRows = Dedup.q75.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val missed = exact -- bloomRows.keySet
    assert(missed.isEmpty, s"bloom lost true contamination hits: $missed")

    // n_maybe counts every gram the filter accepts, so per shared doc it
    // is at least the exact shared-gram count
    val exactCounts = Dedup.q47.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exactCounts.foreach { case (id, n) =>
      assert(bloomRows(id) >= n, s"doc $id: n_maybe ${bloomRows(id)} < exact $n")
    }

    // 24 bits/element: the whole-doc FP probability is ~1e-4, so at
    // 500 docs the expected FP count is ~0 — allow 1% slack
    val nClean = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 50 =!= 0).count()
    val fps = bloomRows.keySet -- exact
    assert(fps.size <= math.max(1, nClean / 100),
      s"${fps.size} bloom false positives over $nClean clean docs")
  }

  test("q75 probes without joining or shuffling the corpus gram stream") {
    val plan = Dedup.q75.fn(spark, sfDir).queryExecution.executedPlan.toString
    // the probe side must reach the bloom as a reused scalar subquery —
    // the corpus grams themselves never enter a join
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"expected scalar-subquery bloom probe:\n$plan")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 0, s"corpus-side probe must be join-free:\n$plan")
  }

  test("contaminationFlags (literal-bloom projection) matches q75's verdicts") {
    val bloom = Dedup.evalGramBloom(spark, sfDir)
    val flagged = Dedup.contaminationFlags(
      Tables.documents(spark, sfDir).filter(col("doc_id") % 50 =!= 0), bloom)
    val flagIds = flagged.filter(col("maybe_contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val q75Ids = Dedup.q75.fn(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagIds == q75Ids,
      s"projection flags diverge from q75: ${flagIds.diff(q75Ids)} / ${q75Ids.diff(flagIds)}")
    // and the projection path is exchange-free end to end
    val plan = flagged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"contaminationFlags must stay a stateless projection:\n$plan")
  }
}
