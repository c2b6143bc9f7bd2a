package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AdcScore, AdcScoreVec, CharNgrams, CosineSim, DotProduct, JaccardSim, MinHashSig, MinWindowHash, PolyHash, PqEncode, SimHash64}

/** SQL-name registration of graft's native expressions.
  *
  * Either build the session with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`, or
  * call [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  /** Fold a foldable numeric-array argument (e.g. an `array(1.0, …)` SQL
    * literal — DECIMAL-typed under ANSI parsing) to the plan-constant
    * double[] the expression carries as a reference object.
    */
  private def doubleArrayLit(e: Expression): Array[Double] = {
    import org.apache.spark.sql.types._
    val ad = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val et = e.dataType.asInstanceOf[ArrayType].elementType
    Array.tabulate(ad.numElements()) { i =>
      et match {
        case DoubleType     => ad.getDouble(i)
        case FloatType      => ad.getFloat(i).toDouble
        case t: DecimalType => ad.getDecimal(i, t.precision, t.scale).toDouble
        case IntegerType    => ad.getInt(i).toDouble
        case LongType       => ad.getLong(i).toDouble
        case other          => ad.get(i, other).toString.toDouble
      }
    }
  }

  private[plans] val builders: Seq[(String, (ExpressionInfo, Seq[Expression] => Expression))] = Seq(
    "cosine_sim" -> (info("cosine_sim", "cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    "jaccard_sim" -> (info("jaccard_sim", "Jaccard similarity of two string arrays"),
      (args: Seq[Expression]) => JaccardSim(args(0), args(1))),
    "char_ngrams" -> (info("char_ngrams", "all character n-grams of a string"),
      (args: Seq[Expression]) => CharNgrams(args(0), intLit(args(1)))),
    "simhash64" -> (info("simhash64", "64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    "minhash_sig" -> (info("minhash_sig", "MinHash signature of a string"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1)), intLit(args(2)))),
    "dot_product" -> (info("dot_product", "dot product of two numeric arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    "poly_hash" -> (info("poly_hash", "engine-portable polynomial hash of a string"),
      (args: Seq[Expression]) => PolyHash(args(0))),
    "min_window_hash" -> (info("min_window_hash", "min w-window polynomial hash (fingerprint)"),
      (args: Seq[Expression]) => MinWindowHash(args(0), intLit(args(1)))),
    "pq_encode" -> (info("pq_encode",
      "PQ codes of a float-array vector vs flattened codebooks (books, nSub, nCodes, subDim)"),
      (args: Seq[Expression]) => PqEncode(args(0), doubleArrayLit(args(1)),
        intLit(args(2)), intLit(args(3)), intLit(args(4)))),
    "adc_score" -> (info("adc_score",
      "ADC distance of a PQ codes row vs a precomputed query table (table, nSub, nCodes)"),
      (args: Seq[Expression]) => AdcScore(args(0), doubleArrayLit(args(1)),
        intLit(args(2)), intLit(args(3)))),
    "adc_score_vec" -> (info("adc_score_vec",
      "ADC distance of a PQ codes row vs an in-row double-array query (q, codes, books, nSub, nCodes, subDim)"),
      (args: Seq[Expression]) => AdcScoreVec(args(0), args(1), doubleArrayLit(args(2)),
        intLit(args(3)), intLit(args(4)), intLit(args(5)))),
    // Spark ships a distributed Bloom-filter build/probe pair for its
    // runtime join filters but leaves both OFF the SQL surface; graft
    // exposes them for set-membership pushdown (e.g. decontamination
    // against a large eval-gram set, q75). Build input must be xxhash64
    // longs; the probe side accepts the aggregate as a scalar subquery
    // or a binary literal.
    "bloom_filter_agg" -> (info("bloom_filter_agg",
      "distributed Bloom filter over xxhash64 longs (child[, estimatedNumItems[, numBits]])"),
      (args: Seq[Expression]) => args.length match {
        case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0)).toAggregateExpression()
        case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1)).toAggregateExpression()
        case _ => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2)).toAggregateExpression()
      }),
    "might_contain" -> (info("might_contain",
      "Bloom-filter membership probe (bloom binary, xxhash64 long)"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))),
    "bpe_token_count" -> (info("bpe_token_count",
      "whole-document BPE token count (text, merge table as a flat string array of (left, right, merged) triples)"),
      (args: Seq[Expression]) =>
        graft.functions.BpeTokenCount(args(0), stringArrayLit(args(1)))),
    "bpe_encode_ids" -> (info("bpe_encode_ids",
      "whole-document BPE token-id sequence as array<int> (text, flat merge triples, vocab array whose index is the id)"),
      (args: Seq[Expression]) =>
        graft.functions.BpeEncodeIds(args(0), stringArrayLit(args(1)),
          stringArrayLit(args(2)))),
    "deflate_len" -> (info("deflate_len",
      "DEFLATE (zlib level 6) compressed byte length of a string's UTF-8 bytes"),
      (args: Seq[Expression]) => graft.functions.DeflateLen(args(0))),
    "inter_count" -> (info("inter_count",
      "exact intersection size of two pre-deduped, pre-sorted string arrays"),
      (args: Seq[Expression]) => graft.functions.InterCount(args(0), args(1))))

  /** Fold a foldable string-array argument to the plan-constant String[]
    * the expression carries as a reference object. Validated HERE, at
    * resolution time, so a malformed merge table is one clear error at
    * analysis instead of an opaque per-row failure at execution.
    */
  private def stringArrayLit(e: Expression): Array[String] = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        "BPE table argument must be a constant array<string> " +
          s"literal, got the non-foldable expression ${e.sql}")
    val folded = e.eval(null)
    if (folded == null)
      throw new IllegalArgumentException(
        "BPE table argument must not be NULL")
    val ad = folded.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val v = ad.getUTF8String(i)
      if (v == null) throw new IllegalArgumentException(
        s"BPE table argument must not contain NULL (element $i)")
      v.toString
    }
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Imperative registration for sessions built without the extensions
    * config (e.g. a driver-owned session).
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, (i, b)) =>
      GraftBridge.registerFunction(spark, name, i, b)
    }
}
