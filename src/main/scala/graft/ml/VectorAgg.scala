package graft.ml

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Typed custom aggregation over vector columns.
  *
  * `VectorAvg` is a Dataset `Aggregator` (map-side-combining, like any
  * built-in agg): elementwise sum + count buffer, one merge per partition
  * pair — O(dim) state per group regardless of row count.
  */
object VectorAgg {

  /** Elementwise mean of fixed-width double arrays (input rows are
    * (label, vector) tuples; the label rides along in the grouping key).
    */
  class VectorAvg(dim: Int) extends Aggregator[(Int, Array[Double]), (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

    override def reduce(b: (Array[Double], Long), row: (Int, Array[Double])): (Array[Double], Long) = {
      val v = row._2
      var i = 0
      while (i < dim) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }

    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

    override def finish(r: (Array[Double], Long)): Array[Double] =
      if (r._2 == 0) r._1 else r._1.map(_ / r._2)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Double]] = Encoders.javaSerialization
  }

  // q34 — per-class embedding centroids via the typed Aggregator, exploded
  // to (label, i, mean) rows for the oracle. Multi-row double means are
  // rounded (summation-order ulp noise).
  val q34: QueryDef = QueryDef.sql(
    "q34_class_centroids",
    """SELECT label, i, round(avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)), 6) AS mean_val
      |FROM embeddings, range(1, 65) t(i)
      |GROUP BY label, i
      |ORDER BY label, i""".stripMargin) { (s, d) =>
    import s.implicits._
    val dim = 64
    Tables.embeddings(s, d)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .as[(Int, Array[Double])]
      .groupByKey(_._1)
      .agg(new VectorAvg(dim).toColumn)
      .flatMap { kv: (Int, Array[Double]) =>
        kv._2.iterator.zipWithIndex.map { case (m, i0) => (kv._1, (i0 + 1).toLong, m) }
      }
      .toDF("label", "i", "mean_val")
      .withColumn("mean_val", round(col("mean_val"), 6))
      .orderBy("label", "i")
  }
}
