package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.VectorExprs

/** Similarity search over the `embeddings` vector column (Array[Float],
  * 64-d).
  *
  * Brute-force cosine is the correctness baseline; the scale paths are
  * random-hyperplane LSH (q51: hash each vector once, shuffle by bucket)
  * and IVF (q53: coarse centroids → probe nearest cells → exact rerank) —
  * both bound candidate generation to bucket-local work instead of the
  * O(n·q) full scan.
  *
  * Cosines are rounded to 8 decimals: the dot-product accumulation order
  * is engine-internal, identical to well below 1e-8.
  */
object Similarity {

  /** Deterministic 64-d query vector: qv[i] = ((i·37) mod 19 − 9)/10.
    * Built as a plain literal (not a HOF expression) so projections using
    * it stay inside whole-stage codegen — an interpreted `transform(...)`
    * in the same Project would evict the whole stage from codegen.
    */
  private val qvArray: Array[Double] =
    Array.tabulate(64)(i0 => (((i0 + 1) * 37) % 19 - 9) / 10.0)
  private def qvLit: Column = typedlit(qvArray)
  private val qvDuck = "list_transform(range(1, 65), i -> (CAST((i * 37) % 19 AS DOUBLE) - 9) / 10)"

  private def cosToQv: Column =
    round(VectorExprs.cosineSim(col("embedding"), qvLit), 8)

  private val cosToQvDuck =
    s"""round(list_sum(list_transform(range(1, 65),
       |      i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) * ((CAST((i * 37) % 19 AS DOUBLE) - 9) / 10)))
       |    / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform($qvDuck, x -> x * x)))), 8)""".stripMargin

  // q50 — brute-force cosine top-k against the fixed query vector: one
  // narrow scan, a per-row codegen'd expression, and a global top-k (no
  // full sort shuffle at scale — Spark's TakeOrderedAndProject).
  val q50: QueryDef = QueryDef.sql(
    "q50_knn_brute",
    s"""SELECT vec_id, label, $cosToQvDuck AS cos_sim
       |FROM embeddings
       |ORDER BY cos_sim DESC, vec_id
       |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), cosToQv.as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(10)
  }

  /** 8 deterministic hyperplanes: plane p component i =
    * ((p·131 + i·17) mod 13) − 6. Bucket = Σ 2^p·[dot_p ≥ 0].
    * Planes are literals + codegen'd DotProduct, so bucketing runs as one
    * whole-stage-codegen projection per vector.
    */
  private def plane(p: Int): Array[Double] =
    Array.tabulate(64)(i0 => ((p * 131 + (i0 + 1) * 17) % 13 - 6).toDouble)

  private def bucketCol(emb: Column): Column =
    (0 until 8).map { p =>
      when(VectorExprs.dotProduct(emb, typedlit(plane(p))) >= 0D, 1L << p).otherwise(0L)
    }.reduce(_ + _)

  /** The query vector's bucket, computed driver-side with the identical
    * left-to-right double arithmetic.
    */
  private def qvBucket: Long =
    (0 until 8).map { p =>
      val pl = plane(p)
      var dot = 0.0
      var i = 0
      while (i < 64) { dot += qvArray(i) * pl(i); i += 1 }
      if (dot >= 0) 1L << p else 0L
    }.sum

  private def bucketDuck(embExpr: String): String =
    "list_sum(list_transform(range(0, 8), p -> CASE WHEN " +
      s"list_sum(list_transform(range(1, 65), i -> CAST($embExpr[CAST(i AS INT)] AS DOUBLE) * (CAST(((p * 131) + i * 17) % 13 AS DOUBLE) - 6))) >= 0 " +
      "THEN (1 << p) ELSE 0 END))"

  // q51 — random-hyperplane LSH ANN: vectors sharing the query's bucket,
  // exact-cosine reranked top-5. The bucket id is computed once per vector
  // (shuffle key at scale); same deterministic planes in both engines.
  val q51: QueryDef = QueryDef.sql(
    "q51_ann_lsh",
    s"""WITH b AS (
       |  SELECT vec_id, label, embedding,
       |    CAST(${bucketDuck("embedding")} AS BIGINT) AS bucket
       |  FROM embeddings),
       |q AS (SELECT ${bucketDuck(qvDuck)} AS qbucket)
       |SELECT vec_id, label, bucket, $cosToQvDuck AS cos_sim
       |FROM b, q
       |WHERE bucket = qbucket
       |ORDER BY cos_sim DESC, vec_id
       |LIMIT 5""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .withColumn("bucket", bucketCol(col("embedding")))
      .filter(col("bucket") === qvBucket)
      .select(col("vec_id"), col("label"), col("bucket"), cosToQv.as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(5)
  }

  // q52 — k-NN graph: top-3 cosine neighbors per vector. Exact pair join
  // is the oracle-checkable baseline (the at-scale path blocks pairs with
  // q51's buckets / q53's cells first).
  val q52: QueryDef = QueryDef.sql(
    "q52_knn_self_join",
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT id_a, rn, id_b, cos_sim FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    round(list_sum(list_transform(range(1, 65),
      |        i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
      |      / (a.nrm * b.nrm), 8) AS cos_sim,
      |    CAST(row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY round(list_sum(list_transform(range(1, 65),
      |          i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
      |        / (a.nrm * b.nrm), 8) DESC, b.vec_id) AS INTEGER) AS rn
      |  FROM v a JOIN v b ON a.vec_id <> b.vec_id) t
      |WHERE rn <= 3
      |ORDER BY id_a, rn""".stripMargin) { (s, d) =>
    // Exact all-pairs kNN needs one side resident per task — the same
    // memory posture as Spark's broadcast join, expressed as a tight
    // per-partition kernel (one fused O(n·d) loop per query vector, no
    // per-pair array materialization). At 100 TB vector counts the exact
    // graph is replaced by q51 (LSH) / q53 (IVF) candidate blocking.
    import s.implicits._
    val k = 3
    val vecs = Tables.embeddings(s, d).select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
        var nrm = 0.0
        var i = 0
        while (i < v.length) { nrm += v(i).toDouble * v(i).toDouble; i += 1 }
        (r.getLong(0), v, math.sqrt(nrm))
      }
      .sortBy(_._1)
    val bc = s.sparkContext.broadcast(vecs)
    // Spark's round(double, 8): BigDecimal.valueOf + HALF_UP — replicate
    // exactly so the result hash-matches the expression-based formulation.
    def r8(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
    s.sparkContext.parallelize(vecs.indices, math.min(32, vecs.length))
      .flatMap { ai =>
        val all = bc.value
        val (idA, va, na) = all(ai)
        // top-k by (cos desc, id_b asc) via insertion into a k-slot buffer
        val bestId = new Array[Long](k)
        val bestCos = Array.fill(k)(Double.NegativeInfinity)
        var bi = 0
        while (bi < all.length) {
          if (bi != ai) {
            val (idB, vb, nb) = all(bi)
            var dot = 0.0
            var i = 0
            while (i < va.length) { dot += va(i).toDouble * vb(i).toDouble; i += 1 }
            val c = r8(dot / (na * nb))
            var pos = k
            while (pos > 0 && (c > bestCos(pos - 1) ||
                (c == bestCos(pos - 1) && idB < bestId(pos - 1)))) pos -= 1
            if (pos < k) {
              var m = k - 1
              while (m > pos) { bestCos(m) = bestCos(m - 1); bestId(m) = bestId(m - 1); m -= 1 }
              bestCos(pos) = c; bestId(pos) = idB
            }
          }
          bi += 1
        }
        (0 until math.min(k, all.length - 1)).map(rn => (idA, rn + 1, bestId(rn), bestCos(rn)))
      }
      .toDF("id_a", "rn", "id_b", "cos_sim")
      .orderBy("id_a", "rn")
  }

  // q53 — IVF ANN: coarse cells from a fixed centroid seed set (vec_id <
  // 16), every vector assigned to its nearest cell, the query probes its 2
  // nearest cells and exact-reranks members. Centroid set is O(cells) —
  // broadcast; assignment is one pass over the data.
  val q53: QueryDef = QueryDef.rowsOnly("q53_ivf_ann") { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cent"))
    def cos(aCol: String, bCol: String): Column =
      VectorExprs.cosineSim(col(aCol), col(bCol))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("cent_cos"), asc("cell_id"))
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("cell_id"),
        cos("embedding", "cent").as("cent_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .drop("rn")
    val qv = s.range(1).select(qvLit.as("qemb"))
    val probed = cents.crossJoin(broadcast(qv))
      .select(col("cell_id"), cos("cent", "qemb").as("qcos"))
      .orderBy(desc("qcos"), asc("cell_id"))
      .limit(2)
    assigned.join(broadcast(probed.select("cell_id")), Seq("cell_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"), col("cell_id"),
        round(cos("embedding", "qemb"), 8).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(10)
  }

  val all: Seq[QueryDef] = Seq(q50, q51, q52, q53)
}
