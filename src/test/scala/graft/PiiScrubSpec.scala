package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** q194 invariants beyond the oracle hash: the scrub actually removes
  * what the counters counted, untouched docs pass through byte-identical,
  * and the injection rules land exactly where doc_id says they must.
  */
class PiiScrubSpec extends SparkSpec {

  private lazy val out = TextAnalysis.q194.fn(spark, sfDir).cache()

  test("injection lands exactly on the doc_id classes") {
    val rows = out.select("doc_id", "n_email", "n_phone", "n_ip").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((r.getInt(1) >= 1) == (id % 7 == 0), s"email flag wrong for $id")
      assert((r.getInt(2) >= 1) == (id % 11 == 0), s"phone flag wrong for $id")
      assert((r.getInt(3) >= 1) == (id % 13 == 0), s"ip flag wrong for $id")
    }
    // mod-1001 (=7·11·13) docs carry all three; sf0.001 has doc_id 0
    val all3 = rows.filter(r => r.getLong(0) % 1001 == 0)
    assert(all3.nonEmpty && all3.forall(r =>
      r.getInt(1) >= 1 && r.getInt(2) >= 1 && r.getInt(3) >= 1))
  }

  test("redacted text contains no residual matches and no-PII docs are untouched") {
    // no-PII docs pass through byte-identical (md5 of original == redacted)
    val joined = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("orig_md5"))
      .join(out, "doc_id")
    assert(joined.filter(col("had_pii") === false &&
      col("redacted_md5") =!= col("orig_md5")).count() == 0)

    // the scrub's own machinery finds ZERO residual matches in what it
    // redacted — counted on the actual redacted text, all three classes
    val scrubbed = TextAnalysis.piiScrubbed(spark, sfDir, TextAnalysis.PiiInjectSql)
    val residual = scrubbed.select(expr(
      s"regexp_count(redacted, '${TextAnalysis.PiiEmailRe}') + " +
        s"regexp_count(redacted, '${TextAnalysis.PiiPhoneRe}') + " +
        s"regexp_count(redacted, '${TextAnalysis.PiiIpRe}')").as("resid"))
      .agg(sum("resid")).collect()(0).getLong(0)
    assert(residual == 0, s"residual PII matches after redaction: $residual")

    // markers actually appear where counters said they would
    assert(scrubbed.filter(col("n_email") > 0 &&
      !col("redacted").contains("<EMAIL>")).count() == 0)
    assert(scrubbed.filter(col("n_phone") > 0 &&
      !col("redacted").contains("<PHONE>")).count() == 0)
    assert(scrubbed.filter(col("n_ip") > 0 &&
      !col("redacted").contains("<IP>")).count() == 0)
  }
}
