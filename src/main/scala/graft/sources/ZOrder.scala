package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — multi-dimensional data
  * layout for scan pruning. Sorting a table on one column makes range
  * predicates on THAT column skip files via parquet min/max footers, but
  * destroys locality on every other column; interleaving the bits of two
  * (or more) dimensions into one sort key gives every dimension partial
  * locality, so a selective predicate on EITHER column — or a box on
  * both — touches a small fraction of the files. This is the lakehouse
  * OPTIMIZE/ZORDER layout rewrite, expressed as plain Spark: one stats
  * job, a codegen'd bit-interleave projection, a range repartition on
  * the z-value, and a sorted parquet write. At 100 TB the payoff is at
  * the FILE LISTING and row-group level: footer stats bound each file's
  * (dim1, dim2) box, and the reader prunes without touching data. The
  * spec measures exactly that — per-file bounding boxes under a box
  * predicate vs a hash layout of the same file count.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs into a
    * z-value: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * A fold of shift/mask Column ops — whole-stage-codegen-friendly, no
    * UDF.
    */
  def zValue2(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** N-dimensional Morton interleave: bit i of dimension j lands at
    * position i·n + j. `bits · dims` must fit a long's 63 value bits.
    */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(bits * dims.length <= 63, s"$bits bits x ${dims.length} dims overflows a long")
    val n = dims.length
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      dims.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** [[writeZOrdered]] over ANY number of dimensions. Same contract:
    * one stats job, one range exchange, sorted files with tight N-D
    * bounding boxes. `curve`: "morton" (the bit-interleave) or
    * "hilbert" (the N-D Skilling walk,
    * [[graft.functions.HilbertIndexN]] — seam-free in every dimension
    * count, preferred when hot predicates sit mid-range).
    */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[String],
      files: Int, bits: Int = 16, curve: String = "morton"): Unit =
    statsFor(df, cols) match {
      case None => df.limit(0).write.mode("overwrite").parquet(path)
      case Some(ranges) =>
        val scaled = cols.zip(ranges).map { case (c, (lo, hi)) =>
          scaleTo(col(c), lo, hi, bits)
        }
        val z = curve match {
          case "morton"  => zValueN(scaled, bits)
          case "hilbert" => graft.functions.SpatialExprs.hilbertIndexN(scaled, bits)
          case other     => throw new IllegalArgumentException(s"unknown curve: $other")
        }
        df.withColumn("_z", z)
          .repartitionByRange(files, col("_z"))
          .sortWithinPartitions("_z")
          .drop("_z")
          .write.mode("overwrite").parquet(path)
    }

  /** One stats job for the clustering columns, guarding the degenerate
    * inputs the curve can't scale: an EMPTY input returns None (caller
    * short-circuits to an empty write — a valid table, zero files of
    * data), and an entirely-null clustering column fails loudly BY NAME
    * instead of NPE-ing inside `getDouble` on the null min.
    */
  private def statsFor(df: DataFrame, cols: Seq[String])
      : Option[Seq[(Double, Double)]] = {
    val aggs = count(lit(1)) +: cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val st = df.agg(aggs.head, aggs.tail: _*).take(1).head
    if (st.getLong(0) == 0L) None
    else Some(cols.zipWithIndex.map { case (c, j) =>
      if (st.isNullAt(1 + 2 * j) || st.isNullAt(2 + 2 * j))
        throw new IllegalArgumentException(
          s"z-order clustering column '$c' is entirely null")
      (st.getDouble(1 + 2 * j), st.getDouble(2 + 2 * j))
    })
  }

  /** Scale a numeric column into [0, 2^bits) from its (lo, hi) stats —
    * the quantized coordinate the curve interleaves.
    */
  private def scaleTo(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, 1e-300)
    val cells = (1L << bits) - 1
    least(greatest(
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(cells + 1)),
      lit(0L)), lit(cells))
  }

  /** Write `df` to `path` as `files` parquet files clustered on
    * (`c1`, `c2`): one O(1)-row stats job, then a single range exchange
    * on the curve value (the only shuffle) with an in-partition sort so
    * every file's footer carries a tight (c1, c2) bounding box.
    * `curve`: "morton" (the bit-interleave above — cheapest, but a box
    * straddling the space's center seam touches many curve segments) or
    * "hilbert" (the codegen'd [[graft.functions.HilbertIndex]] walk —
    * adjacent indices are always adjacent cells, no seam; preferred
    * when hot predicates sit mid-range).
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      files: Int, bits: Int = 16, curve: String = "morton"): Unit =
    statsFor(df, Seq(c1, c2)) match {
      case None => df.limit(0).write.mode("overwrite").parquet(path)
      case Some(Seq((lo1, hi1), (lo2, hi2))) =>
        val (sx, sy) = (
          scaleTo(col(c1), lo1, hi1, bits),
          scaleTo(col(c2), lo2, hi2, bits))
        val z = curve match {
          case "morton"  => zValue2(sx, sy, bits)
          case "hilbert" => graft.functions.SpatialExprs.hilbertIndex(sx, sy, bits)
          case other     => throw new IllegalArgumentException(s"unknown curve: $other")
        }
        df.withColumn("_z", z)
          .repartitionByRange(files, col("_z"))
          .sortWithinPartitions("_z")
          .drop("_z")
          .write.mode("overwrite").parquet(path)
      case Some(other) =>
        throw new IllegalStateException(s"expected 2 stat pairs, got $other")
    }
}
