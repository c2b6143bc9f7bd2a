package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent money sums.
  *
  * A rounded double sum over a corpus-proportional group is a latent
  * oracle/engine mismatch: double addition is non-associative, the
  * accumulated error grows ~sqrt(n)·ulp(sum), and once it crosses half the
  * rounding quantum the ROUNDED total depends on summation order — so two
  * engines (or two partitionings of the same engine) legitimately disagree
  * in the last printed digit. Measured at the r9 sf1 checkpoint: the 5-group
  * nation-revenue sum flipped its 2nd decimal (…71.21 vs …71.20) at ~600k
  * terms per group, with 10× head-room shrinking at every further scale-up.
  *
  * The monetary columns all live on an exact cent grid (and their
  * discount/tax products on the 1e-4 / 1e-6 grids), so the fix is to
  * quantize each TERM back onto its grid as a decimal — recovering the
  * intended exact rational — and let the engine sum decimals, which is
  * exact integer arithmetic and therefore order-independent at any scale.
  * Per-term double→decimal casts agree across engines because the computed
  * double sits ~1e-9 quanta from its grid point, never near a rounding
  * midpoint. Equivalent oracle form:
  * `round(sum(CAST(term AS DECIMAL(28,q))), s)::double`.
  */
object ExactSum {

  /** Sum `c` exactly on a `quantScale`-decimal grid, round to `outScale`,
    * return double (the catalog's money dtype). Decimal(28,q) leaves sum
    * precision 38 — ~1e9 headroom over any 100 TB money total.
    */
  def centSum(c: Column, quantScale: Int, outScale: Int): Column =
    round(sum(c.cast(s"decimal(28,$quantScale)")), outScale).cast("double")
}
