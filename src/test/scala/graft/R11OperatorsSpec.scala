package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Dense replays + structural invariants for the round-11 operator batch
  * (q217 incremental prefix-filter dedup). The headline claims are
  * (a) append == rebuild: refreshing against the frozen snapshot index
  * yields pair-for-pair the output a from-scratch rebuild with FRESH df
  * statistics yields — the prefix lemma holds under any consistent total
  * order and verification is exact, so the frozen order can change
  * candidate sets but never answers; and (b) the corpus index tables are
  * never re-shuffled by a refresh.
  */
class R11OperatorsSpec extends SparkSpec {

  test("q217 incremental refresh == full fresh-df rebuild, restricted to batch-involved pairs") {
    val tau = 0.5
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("jaccard"))).toSet
    val inc = rows(dedup.Dedup.incrementalPrefixJoin(spark, sfDir, tau, takeN = 1 << 20))
    // the rebuild reference: q204's one-shot join over corpus ∪ batch
    // with df counted FRESH over the union — a different token order
    // than the frozen snapshot's, which is exactly the point
    val rebuild = rows(dedup.Dedup.prefixFilterJoin(spark, sfDir, tau, takeN = 1 << 20))
      .filter(t => t._1 % 10 == 0 || t._2 % 10 == 0)
    assert(inc == rebuild,
      s"missed=${(rebuild -- inc).take(5)} extra=${(inc -- rebuild).take(5)}")
    assert(inc.nonEmpty, "fixture must contain batch-involved near-dup pairs")
    // and every emitted pair involves a batch doc (corpus-corpus pairs
    // were settled when the snapshot was built)
    inc.foreach { t =>
      assert(t._1 % 10 == 0 || t._2 % 10 == 0, s"corpus-corpus pair leaked: $t")
    }
  }

  test("q217 plan: corpus index tables are read in place, never under a refresh exchange") {
    val df = dedup.Dedup.incrementalPrefixJoin(spark, sfDir, 0.5, takeN = 100)
    val plan = df.queryExecution.sparkPlan
    def scansUnder(p: SparkPlan): Seq[String] = p.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    val all = scansUnder(plan)
    assert(all.exists(_.contains("graft_pf_prefix")),
      s"candidate join must read the persisted prefix table:\n$plan")
    assert(all.exists(_.contains("graft_pf_docs")),
      s"verification must read the persisted doc-artifact table:\n$plan")
    // no corpus index scan may sit below a shuffle: the refresh moves
    // batch-derived rows INTO the buckets, never the buckets themselves
    val shuffledScans = plan.collect { case e: ShuffleExchangeExec => e }
      .flatMap(scansUnder)
    Seq("graft_pf_prefix", "graft_pf_docs").foreach { t =>
      assert(!shuffledScans.exists(_.contains(t)),
        s"$t was re-shuffled by the refresh:\n$plan")
    }
  }

  test("q217 catalog entry is bounded and ordered like q204") {
    val out = dedup.Dedup.q217.fn(spark, sfDir).collect()
    assert(out.length <= 100)
    val js = out.map(_.getAs[Double]("jaccard"))
    assert(js.sameElements(js.sortBy(-_)), "rows must order by jaccard desc")
    out.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(a < b, s"pair ids must be ordered: ($a, $b)")
    }
  }
}
