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

  // q180 — EXACT ROC AUC of the class-0 centroid scorer (the
  // ranking-quality staple for any scoring filter: "over ALL thresholds
  // at once, how well does this score separate the class from the
  // rest" — the one-number readout a curation bar like q162's or a
  // classifier like q144's is judged by). Score = −distance to q34's
  // class-0 centroid (the same index-ordered ‖x‖² − 2x·c + ‖c‖² 3-sum
  // expression both engines, so quantizing to 2 dp is engine-identical),
  // label = (class 0). AUC by the Mann–Whitney identity
  // P(s⁺ > s⁻) + ½P(s⁺ = s⁻) — but the textbook global rank is a
  // single-partition window that dies at scale, so this plans the
  // HISTOGRAM rank-sum: quantized scores collapse to a bounded value
  // table (the 2-dp quantization IS the scale lever, stated in the
  // contract), one cumulative window over that bounded table yields
  // neg-below-each-score, and wins2 = Σ(2·np·neg_below + np·nn) counts
  // ordered pairs exactly in int64 (ties half-weight via the ×2
  // scaling). ONE corpus exchange (the score groupBy); AUC is a single
  // division in identical operand order, rounded once.
  val q180: QueryDef = QueryDef.sql(
    "q180_roc_auc",
    """WITH cent AS (
      |  SELECT list(round(m, 6) ORDER BY i) AS c
      |  FROM (
      |    SELECT i, avg(CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS m
      |    FROM embeddings, range(1, 65) t(i)
      |    WHERE label = 0
      |    GROUP BY i) x),
      |sc AS (
      |  SELECT (e.label = 0) AS pos,
      |    -round(
      |      list_sum(list_transform(e.embedding,
      |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |      - 2 * list_sum(list_transform(range(1, 65),
      |        i -> CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
      |          * cent.c[CAST(i AS INT)]))
      |      + list_sum(list_transform(cent.c, x -> x * x)), 2) AS score
      |  FROM embeddings e CROSS JOIN cent),
      |h AS (
      |  SELECT score,
      |    CAST(count(CASE WHEN pos THEN 1 END) AS BIGINT) AS np,
      |    CAST(count(CASE WHEN NOT pos THEN 1 END) AS BIGINT) AS nn
      |  FROM sc GROUP BY score),
      |c2 AS (
      |  SELECT score, np, nn,
      |    coalesce(sum(nn) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS neg_below
      |  FROM h),
      |t AS (
      |  SELECT CAST(sum(np) AS BIGINT) AS p, CAST(sum(nn) AS BIGINT) AS n,
      |    CAST(sum(2 * np * neg_below + np * nn) AS BIGINT) AS wins2
      |  FROM c2)
      |SELECT p AS n_pos, n AS n_neg,
      |  round(CAST(wins2 AS DOUBLE) / (2.0 * p * n), 6) AS auc
      |FROM t""".stripMargin) { (s, d) =>
    import graft.functions.VectorExprs
    val c0: Array[Double] = q34.fn(s, d).take(1024)
      .filter(_.getInt(0) == 0).sortBy(_.getLong(1)).map(_.getDouble(2))
    var cc = 0.0
    var i = 0
    while (i < c0.length) { cc += c0(i) * c0(i); i += 1 }
    val dist = VectorExprs.dotProduct(col("embedding"), col("embedding")) -
      lit(2.0) * VectorExprs.dotProduct(col("embedding"), typedlit(c0.toSeq)) +
      lit(cc)
    val sc = Tables.embeddings(s, d)
      .select((col("label") === 0).as("pos"), (-round(dist, 2)).as("score"))
    val h = sc.groupBy("score").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
    // cumulative over the BOUNDED quantized-score table only
    val w = org.apache.spark.sql.expressions.Window.orderBy("score")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    h.withColumn("neg_below", coalesce(sum("nn").over(w), lit(0L)))
      .agg(sum("np").as("p"), sum("nn").as("n"),
        sum(lit(2L) * col("np") * col("neg_below")
          + col("np") * col("nn")).as("wins2"))
      .select(col("p").as("n_pos"), col("n").as("n_neg"),
        round(col("wins2").cast("double")
          / (lit(2.0) * col("p") * col("n")), 6).as("auc"))
  }
}
