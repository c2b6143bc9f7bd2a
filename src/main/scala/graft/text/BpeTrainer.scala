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
    // pairs whose count changed since the last heap refresh
    val dirty = mutable.HashSet.empty[(String, String)]

    def addWord(wi: Int): Unit = {
      val w = words(wi); var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + freq(wi))
        dirty += p
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
        dirty += p
        occ.get(p).foreach { s => s -= wi; if (s.isEmpty) occ.remove(p) }
        j += 1
      }
    }

    i = 0
    while (i < n) { addWord(i); i += 1 }

    // Winner selection via a LAZY max-heap under the (count desc, left
    // asc, right asc) total order: every count change pushes a fresh
    // entry; pops discard entries whose count no longer matches the live
    // map (stale). Per merge that's O(log H) instead of a full O(P)
    // counts scan — the difference between 32k merges in seconds and in
    // hours — and the popped maximum is EXACT under the same order as
    // the old linear scan, so the merge sequence is unchanged. The heap
    // rebuilds from live counts when stale entries dominate, bounding
    // memory at O(P).
    val heapOrd: java.util.Comparator[(Long, String, String)] =
      (a: (Long, String, String), b: (Long, String, String)) => {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c
        else {
          val l = a._2.compareTo(b._2)
          if (l != 0) l else a._3.compareTo(b._3)
        }
      }
    var heap = new java.util.PriorityQueue[(Long, String, String)](
      math.max(counts.size, 16), heapOrd)
    counts.foreach { case ((l, r), c) => heap.add((c, l, r)) }
    dirty.clear()
    def refreshHeap(): Unit = {
      dirty.foreach { p => counts.get(p).foreach(c => heap.add((c, p._1, p._2))) }
      dirty.clear()
      if (heap.size > 4 * counts.size + 64) {
        heap = new java.util.PriorityQueue[(Long, String, String)](
          math.max(counts.size, 16), heapOrd)
        counts.foreach { case ((l, r), c) => heap.add((c, l, r)) }
      }
    }

    val merges = mutable.ListBuffer.empty[(String, String, Long)]
    var round = 0
    while (round < k && counts.nonEmpty) {
      refreshHeap()
      var top = heap.poll()
      while (top != null && !counts.get((top._2, top._3)).contains(top._1))
        top = heap.poll()
      // counts is non-empty and every live pair has a heap entry after
      // refreshHeap — enforce it so a future edit that breaks the
      // invariant fails diagnosably, not with a MatchError on null
      require(top != null,
        s"heap invariant violated: ${counts.size} live pairs but no heap entry")
      val (bestC, bestL, bestR) = top
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
