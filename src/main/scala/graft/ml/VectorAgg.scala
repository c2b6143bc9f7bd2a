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

  // q144 — LABEL-NOISE AUDIT (nearest-centroid disagreement, the cheap
  // confident-learning pass): assign every vector to its nearest class
  // centroid; the (label, assigned) confusion table says which classes
  // bleed into each other and how many examples look mislabeled
  // (assigned ≠ label) — the triage list before a relabeling budget is
  // spent. Scale shape: centroids are q34's ROUNDED per-class means (a
  // 10×64 bounded driver read — its oracle proves the 6-dp rounding is
  // engine-identical); distances to all 10 ride ONE codegen'd projection
  // as ‖x‖² − 2x·c + ‖c‖² against centroid literals (no join, no
  // shuffle); the confusion rollup moves O(classes²) rows. Distance
  // arithmetic is the same index-ordered 3-sum expression in both
  // engines, so the argmin (ties → lowest label) needs no rounding.
  val q144: QueryDef = QueryDef.sql(
    "q144_label_noise",
    """WITH cent AS (
      |  SELECT label, list(round(m, 6) ORDER BY i) AS c
      |  FROM (
      |    SELECT label, i, avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS m
      |    FROM embeddings, range(1, 65) t(i)
      |    GROUP BY label, i) x
      |  GROUP BY label),
      |d AS (
      |  SELECT e.vec_id, e.label, cent.label AS clabel,
      |    list_sum(list_transform(e.embedding,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |      - 2 * list_sum(list_transform(range(1, 65),
      |        i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * cent.c[CAST(i AS INT)]))
      |      + list_sum(list_transform(cent.c, x -> x * x)) AS dist
      |  FROM embeddings e CROSS JOIN cent),
      |a AS (
      |  SELECT vec_id, label, clabel AS assigned
      |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
      |          ORDER BY dist, clabel) AS rn FROM d)
      |  WHERE rn = 1)
      |SELECT label, assigned, CAST(count(*) AS BIGINT) AS n
      |FROM a GROUP BY label, assigned
      |ORDER BY label, assigned""".stripMargin) { (s, d) =>
    import graft.functions.VectorExprs
    // q34's rounded centroid rows — bounded: classes × 64
    val centRows = q34.fn(s, d).take(1024)
    require(centRows.length < 1024, "centroid read overflow")
    val cents: Seq[(Int, Array[Double])] = centRows
      .groupBy(_.getInt(0)).toSeq
      .map { case (l, rows) =>
        (l, rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray)
      }
      .sortBy(_._1)
    val emb = Tables.embeddings(s, d)
    val distCols = cents.map { case (l, c) =>
      var cc = 0.0
      var i = 0
      while (i < c.length) { cc += c(i) * c(i); i += 1 }
      (l,
        VectorExprs.dotProduct(col("embedding"), col("embedding"))
          - lit(2.0) * VectorExprs.dotProduct(col("embedding"), typedlit(c))
          + lit(cc))
    }
    val minDist = least(distCols.map(_._2): _*)
    // ascending-label when-chain = ties break to the lowest label,
    // mirroring the oracle's ORDER BY dist, clabel
    val assigned = coalesce(distCols.map { case (l, dc) =>
      when(dc === minDist, lit(l)) }: _*)
    emb.select(col("label"), assigned.as("assigned"))
      .groupBy("label", "assigned").agg(count(lit(1)).as("n"))
      .orderBy("label", "assigned")
  }
}
