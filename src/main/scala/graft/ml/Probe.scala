package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Linear probing — the standard embedding-quality audit (fit the
  * cheapest possible model, a closed-form ridge classifier, on frozen
  * embeddings; probe accuracy is the measure of how linearly accessible
  * the label information is, the first readout any representation report
  * ships). Training is NOT iterative here: one-vs-rest ridge has the
  * closed form W = (XᵀX + λI)⁻¹ XᵀY, and XᵀX/XᵀY are ONE treeAggregate
  * over the corpus — O(d²) communication per partition, independent of
  * row count (the q25/q157/Whitening sufficient-statistics argument).
  * The (d+1)² solve happens once at the driver; prediction is one
  * broadcast-weights map pass + a bounded per-class aggregate.
  */
object Probe {

  /** Solve A·x = b for symmetric positive-definite A (Gaussian
    * elimination with partial pivoting — d ≤ 65, driver-side).
    */
  private[graft] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < n) {
      var p = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      val t = a(col); a(col) = a(p); a(p) = t
      val tb = b(col); b(col) = b(p); b(p) = tb
      val piv = a(col)(col)
      require(math.abs(piv) > 1e-12, s"singular normal matrix at $col")
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / piv
        if (f != 0.0) {
          var j = col
          while (j < n) { a(r)(j) -= f * a(col)(j); j += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Fit the one-vs-rest ridge probe: returns (weights per class
    * including bias as the last coordinate, nClasses). λ is the
    * documented contract (1.0 — the probe convention: strong enough to
    * keep the solve stable, weak enough not to mask the signal).
    */
  private[graft] def fit(s: SparkSession, d: String, lambda: Double = 1.0)
      : (Array[Array[Double]], Int) = {
    import s.implicits._
    val dim = 64
    val aug = dim + 1 // bias coordinate
    val rows = Tables.embeddings(s, d)
      .select(col("embedding").cast("array<double>").as("emb"), col("label"))
      .as[(Array[Double], Int)]
    val k = rows.agg(max(col("label"))).head().getInt(0) + 1
    // (XᵀX upper-as-full, XᵀY, n) in one pass; merges elementwise add
    val (xtx, xty, _) = rows.rdd.treeAggregate(
      (new Array[Double](aug * aug), new Array[Double](aug * k), 0L))(
      seqOp = { case ((xtx, xty, n), (x0, y)) =>
        val x = new Array[Double](aug)
        System.arraycopy(x0, 0, x, 0, dim)
        x(dim) = 1.0
        var i = 0
        while (i < aug) {
          val off = i * aug
          var j = 0
          while (j < aug) { xtx(off + j) += x(i) * x(j); j += 1 }
          xty(i * k + y) += x(i)
          i += 1
        }
        (xtx, xty, n + 1)
      },
      combOp = { case ((a1, a2, n1), (b1, b2, n2)) =>
        var i = 0
        while (i < aug * aug) { a1(i) += b1(i); i += 1 }
        i = 0
        while (i < aug * k) { a2(i) += b2(i); i += 1 }
        (a1, a2, n1 + n2)
      }, depth = 2)
    val a = Array.tabulate(aug, aug) { (i, j) =>
      xtx(i * aug + j) + (if (i == j) lambda else 0.0)
    }
    val w = Array.tabulate(k) { c =>
      solve(a, Array.tabulate(aug)(i => xty(i * k + c)))
    }
    (w, k)
  }

  // q239 — linear probe of the embedding column (the representation-
  // quality readout every embedding pipeline reports before anything
  // heavier: if a closed-form linear classifier can't separate the
  // labels, no amount of kNN machinery will — and when it CAN, the
  // embedding carries the signal linearly). Per-class rows: support,
  // correct count, accuracy (single IEEE division). Scale shape: ONE
  // treeAggregate for the
  // sufficient statistics (communication O(d²·partitions), row-count
  // free), a 65×65 driver solve, then ONE broadcast-weights prediction
  // pass into a bounded per-class aggregate. treeAggregate sum order →
  // ulp-level weight jitter → rows-only (the spec solves the same
  // system by an independent eigendecomposition route and matches
  // weights, predictions, and accuracies).
  // NOTE (fixture): this corpus's labels are independent of embedding
  // geometry by construction (q135's documented property), so probe
  // accuracy here reflects ridge memorization capacity, not real
  // signal — the spec asserts mechanism, not separability.
  val q239: QueryDef = QueryDef.rowsOnly("q239_linear_probe") { (s, d) =>
    import s.implicits._
    val (w, k) = fit(s, d)
    val bw = s.sparkContext.broadcast(w)
    val dim = 64
    val scored = Tables.embeddings(s, d)
      .select(col("embedding").cast("array<double>"), col("label"))
      .as[(Array[Double], Int)]
      .map { case (x, y) =>
        val ws = bw.value
        var best = 0
        var bestS = Double.NegativeInfinity
        var c = 0
        while (c < ws.length) {
          val wc = ws(c)
          var sc = wc(dim)
          var i = 0
          while (i < dim) { sc += wc(i) * x(i); i += 1 }
          if (sc > bestS) { bestS = sc; best = c }
          c += 1
        }
        (y, if (best == y) 1L else 0L)
      }
      .toDF("label", "correct")
    scored.groupBy("label")
      .agg(count(lit(1)).as("n"), sum("correct").as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        (col("n_correct").cast("double") / col("n")).as("accuracy"))
      .orderBy("label")
  }

  val all: Seq[QueryDef] = Seq(q239)
}
