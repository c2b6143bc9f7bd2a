package graft.ml

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Trained coarse quantizer shared by q33 (cluster audit) and q53 (IVF
  * probe): one MLlib KMeans fit over the embeddings, memoized per
  * (session, dir) so catalog queries pay the iterative fit once. The
  * driver only ever holds the model's O(k·d) centroid matrix — cluster
  * state never leaves the executors during the fit (MLlib's treeAggregate
  * implementation).
  *
  * SPHERICAL: vectors are L2-normalized before the fit, so the
  * quantizer's Euclidean metric coincides with cosine (|u−c|² = 2−2cosθ
  * on the unit sphere). Downstream ANN queries rerank by cosine — an
  * unnormalized quantizer puts cosine-near, norm-far vectors in
  * un-probed cells and recall collapses.
  */
object Centroids {

  /** Floor on the cell count (sf0.001-sized corpora). */
  val MinK = 16

  /** Coarse-quantizer cell count — SCALES WITH THE CORPUS as
    * max(16, ⌈√n⌉), the same invariant as the seed blocking quantizer
    * (Dedup.nCells): per-cell population grows like √n instead of
    * linearly, so IVF probe cost and any cell-blocked pair volume stay
    * sub-quadratic at 100× data. Consumers read the count off the fitted
    * model's centroid matrix, so nothing else hard-codes it.
    */
  def k(s: SparkSession, dir: String): Int =
    math.max(MinK,
      math.ceil(math.sqrt(graft.Tables.embeddingsCount(s, dir).toDouble)).toInt)

  /** The L2-normalized embedding as an MLlib vector column. */
  def unitVec: Column = {
    val e = col("embedding").cast("array<double>")
    val nrm = sqrt(aggregate(e, lit(0d), (a, x) => a + x * x))
    array_to_vector(transform(e, x => x / nrm))
  }

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), KMeansModel]()
  graft.Memos.register { () => memo.clear() }

  def model(s: SparkSession, dir: String): KMeansModel =
    memo.computeIfAbsent((s, dir), { _ =>
      val src = Tables.embeddings(s, dir).withColumn("fvec", unitVec)
      new KMeans()
        .setK(k(s, dir)).setSeed(666L).setMaxIter(10).setFeaturesCol("fvec")
        .fit(src)
    })

  /** Centroid vectors as plain arrays — O(k·d), safe to embed as plan
    * literals / ship in a closure.
    */
  def centers(s: SparkSession, dir: String): Array[Array[Double]] =
    model(s, dir).clusterCenters.map(_.toArray)

  /** Product-quantization codebooks: the 64-d space split into `nSub`
    * subspaces, each with its own `codesPerSub`-centroid KMeans fit over
    * the subvectors. Memoized per (session, dir); the driver holds the
    * O(nSub · codes · subDim) codebook matrix — the whole point of PQ is
    * that this is the ONLY uncompressed vector state anyone keeps.
    */
  val PqSub = 8
  val PqCodes = 16
  private val pqMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Array[Array[Array[Double]]]]()
  graft.Memos.register { () => pqMemo.clear() }

  def pqCodebooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqMemo.computeIfAbsent((s, dir), { _ =>
      val subDim = 64 / PqSub
      // spherical: codebooks fit on L2-normalized vectors, matching the
      // cosine rerank downstream (see `unitVec` note)
      val e = col("embedding").cast("array<double>")
      val nrm = sqrt(aggregate(e, lit(0d), (a, x) => a + x * x))
      val base = Tables.embeddings(s, dir)
        .select(transform(e, x => x / nrm).as("e")).cache()
      val books = (0 until PqSub).map { sub =>
        val sv = base.select(array_to_vector(
          slice(col("e"), sub * subDim + 1, subDim)).as("fvec"))
        new KMeans()
          .setK(PqCodes).setSeed(666L + sub).setMaxIter(5).setFeaturesCol("fvec")
          .fit(sv)
          .clusterCenters.map(_.toArray)
      }.toArray
      base.unpersist()
      books
    })
}
