package graft

import graft.operators.SkewLab

/** Measured skew-remedy demonstration (VERDICT-r8 #6): same join, three
  * strategies, asserted POST-SPLIT partition histograms — not just plan
  * markers. The sf1 artifact (SKEW_sf1.json, `graft.SkewDemo`) records
  * the same measurements at megabyte-partition scale.
  */
class SkewLabSpec extends SparkSpec {

  test("zipf corpus is provably hot and q108-style diagnosis flags it") {
    val diag = SkewLab.diagnose(spark, sfDir).collect()
    assert(diag.length == 3)
    val top = diag.head
    assert(top.getLong(1) == 1L, "hottest key must be zkey=1")
    val share = top.getDouble(3)
    // P(zkey=1) = 1/2 exactly; hash sampling noise at sf0.001 is a few %
    assert(share > 0.42 && share < 0.58, s"hot-key share $share should be ~0.5")
    val skewFactor = top.getDouble(7)
    assert(skewFactor >= 20.0,
      s"diagnosis must scream before the join is attempted (skew_factor=$skewFactor)")
  }

  test("AQE skew-split and salting measurably flatten the hot partition") {
    val plain = SkewLab.run(spark, sfDir, "plain")
    val aqe = SkewLab.run(spark, sfDir, "aqe", advisoryBytes = "1KB")
    // salt ≫ shuffle partitions: with salt ~= partitions the hot key's
    // few sub-keys can hash-collide into one reducer and undo the spread
    val salted = SkewLab.run(spark, sfDir, "salted", salt = 32)

    // all three computed the SAME join
    assert(Set(plain.checksum, aqe.checksum, salted.checksum).size == 1)
    assert(Set(plain.rows, aqe.rows, salted.rows).size == 1)

    // the disease: hashpartitioning(zkey) puts the hot key's ~50% of all
    // rows into one reducer regardless of partition count
    assert(plain.maxShare >= 0.40,
      s"plain join should concentrate the hot key (maxShare=${plain.maxShare})")
    assert(!plain.planSkewSplit)

    // remedy 1: AQE OptimizeSkewedJoin splits the hot partition at
    // runtime — marker in the executed plan AND a measurably flatter
    // histogram (the r8 verdict's ask: assert sizes, not just skew=true)
    assert(aqe.planSkewSplit, "AQE run must carry skew=true in the executed plan")
    assert(aqe.maxShare <= plain.maxShare * 0.6,
      s"AQE split should flatten: ${aqe.maxShare} vs plain ${plain.maxShare}")
    assert(aqe.partitions > plain.partitions)

    // remedy 2: manual salt spreads the hot key over `salt` sub-keys
    // before the exchange — no AQE involvement, same flattening
    assert(!salted.planSkewSplit)
    assert(salted.maxShare <= plain.maxShare * 0.6,
      s"salting should flatten: ${salted.maxShare} vs plain ${plain.maxShare}")
  }
}
