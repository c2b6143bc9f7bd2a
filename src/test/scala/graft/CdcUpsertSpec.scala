package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Backs q196's scale claim: a standing state snapshot refreshed by
  * compacting ONLY the delta op-log and upserting the compacted rows
  * equals replaying the entire log from scratch — so the per-refresh
  * cost is O(delta log), never O(full history).
  */
class CdcUpsertSpec extends SparkSpec {

  // the same latest-op-wins compaction shape as q196 (hash aggregate,
  // int delete flag, max_by payload), over an arbitrary (k, seq, op,
  // val) log
  private def compact(log: DataFrame): DataFrame =
    log.groupBy("k")
      .agg(expr("max_by(case when op = 'D' then 1 else 0 end, seq)")
          .as("del"),
        expr("max_by(v, seq)").as("v"),
        max("seq").as("seq"))

  test("compact(delta) upserted into the snapshot equals replaying the full log") {
    import spark.implicits._
    // history: 400 keys, ops across two epochs (seq 1-3 = epoch A,
    // seq 4-6 = epoch B). Key classes: update-only, delete-in-B,
    // insert-in-B, delete-in-A-reinsert-in-B.
    def ops(lo: Int, hi: Int): Seq[(Long, Int, String, Long)] =
      (0 until 400).flatMap { k =>
        (lo to hi).flatMap { s =>
          val kind = (k + s) % 5
          if (k % 4 == 3 && s < 4) Nil // insert-in-B keys are silent in A
          else if (kind == 0) Seq((k.toLong, s, "D", 0L))
          else Seq((k.toLong, s, if (s == 1) "I" else "U", k * 1000L + s))
        }
      }
    val epochA = ops(1, 3).toDF("k", "seq", "op", "v")
    val epochB = ops(4, 6).toDF("k", "seq", "op", "v")
    // standing snapshot = compacted epoch A (live rows only)
    val snapshot = compact(epochA).filter(col("del") === 0)
      .select("k", "v", "seq")
    // refresh path: compact ONLY the delta, then upsert — delta rows
    // replace snapshot rows by key (latest-wins on seq is structural:
    // every delta seq > every snapshot seq), deletes drop the key
    val deltaC = compact(epochB)
    val merged = snapshot.as("s")
      .join(deltaC.as("d"), Seq("k"), "full_outer")
      .filter(coalesce(col("d.del"), lit(0)) === 0)
      .select(col("k"),
        coalesce(col("d.v"), col("s.v")).as("v"),
        coalesce(col("d.seq"), col("s.seq")).as("seq"))
    // truth: replay the WHOLE history in one compaction
    val truth = compact(epochA.unionByName(epochB))
      .filter(col("del") === 0).select("k", "v", "seq")
    val m = merged.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getInt(2))).toMap
    val t = truth.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getInt(2))).toMap
    assert(m == t, {
      val onlyM = (m.keySet -- t.keySet).take(5)
      val onlyT = (t.keySet -- m.keySet).take(5)
      val diff = m.keySet.intersect(t.keySet)
        .filter(k => m(k) != t(k)).take(5)
      s"upsert != replay: onlyMerged=$onlyM onlyTruth=$onlyT diff=$diff"
    })
    // the key classes all occurred (the test exercises what it claims)
    assert(t.nonEmpty)
    val deletedInB = compact(epochB).filter(col("del") === 1).count()
    assert(deletedInB > 0, "no delete-in-delta keys exercised")
  }
}
