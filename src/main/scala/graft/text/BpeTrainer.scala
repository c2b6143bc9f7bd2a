package graft.text

import scala.collection.mutable

/** In-memory BPE merge loop over the PRUNED vocabulary table.
  *
  * The distributed half of tokenizer training is the corpus scan that
  * builds the (word, freq) TYPE table and the histogram prune that bounds
  * it ([[TextAnalysis]]'s `trainBpe`); what reaches the driver is a capped
  * model artifact (at most `bpeMaxTypes` rows), not the corpus. From there
  * merge selection is pure model fitting — running it as k sequential
  * Spark jobs (round 4's shape) costs O(k) driver-coordinated rounds,
  * which at a production 32k-merge vocabulary is days of fixed job
  * overhead. Here pair counts update INCREMENTALLY: each merge touches
  * only the word types that contain the winning pair, so total update
  * work across all merges is O(total symbol occurrences), independent of
  * how the merges interleave.
  *
  * Determinism: the winner each round is (count desc, left asc,
  * right asc) — the same total order as the round-4 distributed fold and
  * the dense spec reference, and independent of hash-map iteration order
  * because the scan takes an exact maximum under that order.
  */
object BpeTrainer {

  /** Run up to `k` merges over `(word, freq)` types; stops early when no
    * adjacent pair remains (every type fully merged). Returns the merge
    * table as (left, right, pairCount) in rank order.
    */
  def train(types: Array[(String, Long)], k: Int): List[(String, String, Long)] = {
    val n = types.length
    val freq = new Array[Long](n)
    val words = new Array[mutable.ArrayBuffer[String]](n)
    var i = 0
    while (i < n) {
      freq(i) = types(i)._2
      words(i) = mutable.ArrayBuffer.from(types(i)._1.split(""))
      i += 1
    }
    // counts: aggregate pair frequency (per occurrence × type freq);
    // occ: which word types currently contain the pair at least once.
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.BitSet]

    def addWord(wi: Int): Unit = {
      val w = words(wi); var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + freq(wi))
        occ.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        j += 1
      }
    }
    def removeWord(wi: Int): Unit = {
      val w = words(wi); var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        val c = counts(p) - freq(wi)
        if (c == 0L) counts.remove(p) else counts.update(p, c)
        occ.get(p).foreach { s => s -= wi; if (s.isEmpty) occ.remove(p) }
        j += 1
      }
    }

    i = 0
    while (i < n) { addWord(i); i += 1 }

    val merges = mutable.ListBuffer.empty[(String, String, Long)]
    var round = 0
    while (round < k && counts.nonEmpty) {
      var bestL: String = null; var bestR: String = null; var bestC = 0L
      counts.foreach { case ((l, r), c) =>
        if (bestL == null || c > bestC ||
            (c == bestC && (l < bestL || (l == bestL && r < bestR)))) {
          bestL = l; bestR = r; bestC = c
        }
      }
      merges += ((bestL, bestR, bestC))
      val merged = bestL + bestR
      // Rewrite only the types containing the pair: same left-to-right
      // greedy fold as the encoder (acc.last == l && next == r → merge).
      occ((bestL, bestR)).toArray.foreach { wi =>
        removeWord(wi)
        val w = words(wi)
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < w.length) {
          if (out.nonEmpty && out.last == bestL && w(j) == bestR)
            out(out.length - 1) = merged
          else out += w(j)
          j += 1
        }
        words(wi) = out
        addWord(wi)
      }
      round += 1
    }
    merges.toList
  }
}
