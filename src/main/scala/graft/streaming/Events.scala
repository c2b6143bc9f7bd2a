package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.{QueryDef, Tables}

/** Streaming surface over `events`.
  *
  * q80 is the tumbling-window aggregation in its batch-equivalent form
  * (the oracle); `windowedAggStream` is the same plan over a streaming
  * Dataset with a watermark — the spec drives it through MemoryStream.
  * q81 is stateful sessionization via flatMapGroupsWithState; its batch
  * entry runs the identical session-reduction logic per user group.
  */
object Events {

  // q80 — tumbling 1-hour window aggregation per event type.
  val q80: QueryDef = QueryDef.sql(
    "q80_windowed_agg",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
      |  event_type, count(*) AS n,
      |  round(sum(CAST(value AS DECIMAL(28,2))), 2)::double AS total
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.ExactSum.centSum(col("value"), 2, 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("win_start", "event_type")
  }

  /** The q80 plan as a true streaming query (watermarked update-mode
    * windowed agg). Exercised by the streaming spec via MemoryStream.
    */
  def windowedAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total"))

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  case class Session(user_id: Long, session_idx: Int, first_event: Long,
      n_events: Long, session_value: Double)
  case class UserState(sessions: List[Session], lastUs: Long, nextIdx: Int,
      openFirst: Long, openN: Long, openSum: Double)

  private val GapUs = 1800000000L // 30 min

  /** Session reduction for one user's time-ordered events. */
  private def reduceSessions(userId: Long, evs: Iterator[Ev]): List[Session] = {
    val sorted = evs.toArray.sortBy(e => (e.ts_us, e.event_id))
    var out = List.newBuilder[Session]
    var idx = 0
    var first = -1L; var n = 0L; var sum = 0.0; var lastUs = Long.MinValue
    sorted.foreach { e =>
      if (first < 0 || e.ts_us - lastUs > GapUs) {
        if (first >= 0) out += Session(userId, idx, first, n, sum)
        idx += 1; first = e.event_id; n = 0; sum = 0.0
      }
      n += 1; sum += e.value; lastUs = e.ts_us
    }
    if (first >= 0) out += Session(userId, idx, first, n, sum)
    out.result()
  }

  // q81 — stateful sessionization through the typed groups API (the same
  // per-group logic the streaming flatMapGroupsWithState path uses). The
  // typed state machine is oracle-checked against the SQL formulation
  // (lag-gap flags → running sum → per-session aggregate) in DuckDB.
  val q81: QueryDef = QueryDef.sql(
    "q81_stream_sessionize",
    """WITH e AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, event_id, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM e),
      |f AS (
      |  SELECT user_id, session_idx, value,
      |    first_value(event_id) OVER (PARTITION BY user_id, session_idx
      |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS fe
      |  FROM s)
      |SELECT user_id, CAST(session_idx AS INTEGER) AS session_idx,
      |  min(fe) AS first_event, count(*) AS n_events,
      |  round(sum(value), 3) AS session_value
      |FROM f
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[Ev]) => reduceSessions(uid, it))
      .toDF()
      .withColumn("session_value", round(col("session_value"), 3))
      .orderBy("user_id", "session_idx")
  }

  /** Streaming sessionization: event-time state machine per user with a
    * processing-time-free, watermark-driven close. Sessions emit when the
    * 30-min gap is exceeded by a newly arrived batch (exercised by spec).
    */
  def sessionizeStream(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[UserState]) =>
          val st = state.getOption.getOrElse(UserState(Nil, Long.MinValue, 0, -1L, 0L, 0.0))
          var (idx, first, n, sum, lastUs) = (st.nextIdx, st.openFirst, st.openN, st.openSum, st.lastUs)
          val closed = List.newBuilder[Session]
          batch.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (first < 0 || e.ts_us - lastUs > GapUs) {
              if (first >= 0) closed += Session(uid, idx, first, n, sum)
              idx += 1; first = e.event_id; n = 0; sum = 0.0
            }
            n += 1; sum += e.value; lastUs = e.ts_us
          }
          state.update(UserState(Nil, lastUs, idx, first, n, sum))
          closed.result().iterator
      }
  }

  case class TypedEv(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  case class TransState(lastUs: Long, lastType: String, lastId: Long)
  case class Transition(user_id: Long, from_t: String, to_t: String)

  /** STREAMING transition extraction — q113's live sibling: each
    * same-user consecutive event pair within the 30-min gap emits one
    * (from, to) transition AS IT ARRIVES, ready for a downstream
    * windowed count (the Markov matrix maintains itself). State per
    * user is exactly ONE event (the latest) — the smallest stateful
    * streaming operator in the engine; the sessionizeStream per-batch
    * sort handles intra-batch disorder, and like q81's contract,
    * cross-batch order is the source's responsibility (a watermarked
    * upstream dedup/sort feeds this in production). Spec asserts the
    * transition multiset equals batch q113's counts on the same rows
    * across arbitrary batch splits.
    */
  def transitionStream(events: Dataset[TypedEv]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TypedEv], state: GroupState[TransState]) =>
          var st = state.getOption.getOrElse(TransState(Long.MinValue, null, -1L))
          val out = List.newBuilder[Transition]
          batch.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (st.lastType != null && e.ts_us - st.lastUs <= GapUs)
              out += Transition(uid, st.lastType, e.event_type)
            st = TransState(e.ts_us, e.event_type, e.event_id)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class PathState(ts1: Long, t1: String, ts2: Long, t2: String)
  case class PathHit(user_id: Long, path: String)

  /** STREAMING 3-step path extraction — q143's live sibling and
    * [[transitionStream]]'s one-step-deeper cousin: each same-user
    * consecutive event TRIPLE whose two gaps both fit the 30-min session
    * bound emits its `a>b>c` path as the third event arrives. State per
    * user is the last TWO events — still O(1); the same per-batch
    * (ts, event_id) sort handles intra-batch disorder, cross-batch order
    * is the source's contract (as q81/q113's faces). Downstream, a
    * windowed count over `path` maintains the journey distribution live.
    * Spec asserts the path multiset equals q143's pre-limit batch rule
    * across batch splits.
    */
  def pathStream(events: Dataset[TypedEv]): Dataset[PathHit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, PathHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TypedEv], state: GroupState[PathState]) =>
          var st = state.getOption.getOrElse(
            PathState(Long.MinValue, null, Long.MinValue, null))
          val out = List.newBuilder[PathHit]
          batch.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (st.t1 != null && st.t2 != null &&
                st.ts2 - st.ts1 <= GapUs && e.ts_us - st.ts2 <= GapUs)
              out += PathHit(uid, s"${st.t1}>${st.t2}>${e.event_type}")
            st = PathState(st.ts2, st.t2, e.ts_us, e.event_type)
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class QuotaDoc(doc_id: Long, source: String, n_tok: Int)
  case class QuotaState(cum: Long)

  /** STREAMING quota admission — the token-budget rule (q103's greedy
    * `cum − n_tok < quota`, crossing doc admitted) enforced per source
    * AS DOCUMENTS ARRIVE: an ingestion valve that stops pulling from a
    * source the moment its budget fills, instead of over-ingesting and
    * trimming offline. Admission is arrival-ordered (per-batch doc_id
    * sort) rather than q103's quality-ordered — the live/offline trade
    * documented on both. State per source is ONE counter; a source past
    * its quota admits nothing ever after, so state is also final.
    */
  def quotaAdmitStream(docs: Dataset[QuotaDoc], quota: Long): Dataset[QuotaDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[QuotaState, QuotaDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, batch: Iterator[QuotaDoc], state: GroupState[QuotaState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = List.newBuilder[QuotaDoc]
          batch.toArray.sortBy(_.doc_id).foreach { d =>
            if (cum < quota) { out += d; cum += d.n_tok }
          }
          state.update(QuotaState(cum))
          out.result().iterator
      }
  }

  /** STREAMING quality gate — the q151/q152/q60 quality signals (DEFLATE
    * compression ratio, letter-distribution entropy, whitespace token
    * count) as ONE stateless codegen'd projection over an arriving
    * documents stream, plus the composite keep decision an ingestion
    * valve applies at the door (cheap-reject before any stateful or
    * shuffled stage sees the doc). Stateless = no watermark, no state
    * store, pure map parallelism at any rate; the batch face is
    * definitionally the same expression tree (StreamingSpec asserts
    * row-for-row parity against a batch projection of the same metrics).
    * Thresholds: ratio ≥ 0.25 (q151's repetition bound), entropy ≥ 1.5
    * nats (q152's gibberish floor), ≥ 5 tokens.
    */
  def qualityGateStream(docs: DataFrame): DataFrame = {
    val ratio = col("comp_len").cast("double") / col("raw_len")
    docs
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("int").as("raw_len"),
        graft.functions.VectorExprs.deflateLen(col("text")).as("comp_len"),
        graft.text.TextAnalysis.letterEntropyCol.as("entropy"),
        size(split(trim(col("text")), "\\s+")).as("n_tok"))
      .filter(col("raw_len") > 0)
      .select(col("doc_id"), col("source"), col("raw_len"), col("comp_len"),
        round(ratio, 6).as("ratio"), round(col("entropy"), 6).as("entropy"),
        col("n_tok"),
        (ratio >= 0.25 && col("entropy") >= 1.5 && col("n_tok") >= 5).as("keep"))
  }

  /** STREAMING epoch resampling — q160's temperature schedule applied AS
    * DOCUMENTS ARRIVE: the frozen (source, rate) schedule joins the
    * stream broadcast (stream-static, no state, no watermark) and each
    * doc fans out into floor(rate) copies plus the q160 deterministic-
    * hash stochastic extra, tagged with copy_idx. Emitting actual
    * duplicated rows (not a count) is the point — the downstream shard
    * writer consumes a ready-mixed stream. Docs from sources absent in
    * the schedule are dropped (inner join — an unscheduled source has no
    * business in the epoch). Batch face is the identical expression tree
    * (spec: per-source emitted-row counts equal q160's copy column, and
    * streamed == batch row-for-row).
    */
  def resampleStream(docs: DataFrame, schedule: DataFrame): DataFrame = {
    val copies = floor(col("rate")).cast("long") +
      when((col("doc_id") % 9973L) * 131L % 1000L
          < (col("rate") - floor(col("rate"))) * 1000, 1L).otherwise(0L)
    docs
      .join(broadcast(schedule), "source")
      .withColumn("copies", copies)
      .withColumn("copy_idx",
        explode(when(col("copies") >= 1L,
          sequence(lit(1L), col("copies"))).otherwise(array())))
      .select(col("doc_id"), col("source"), col("copy_idx"))
  }

  /** Stream-static enrichment: a streaming event feed joined to a static
    * (broadcast) dimension — the standard shape for attaching reference
    * data to a stream without state.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exactly-once-style dedup: drop replayed keys within the
    * watermark horizon — state holds one entry per key and expires with
    * the watermark, so memory is bounded by the horizon × key rate, not
    * stream length (the at-least-once→effectively-once repair step in
    * ingestion pipelines).
    */
  def dedupStream(events: DataFrame, key: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates(key)

  /** Stream-stream interval join: purchases ⨝ views of the same user with
    * the view inside (purchase_ts − 30 min, purchase_ts]. Both sides are
    * watermarked, and the event-time bound lets Spark expire join state —
    * each side buffers only the watermark horizon, so state is bounded at
    * any input rate. Exercised by the streaming spec via MemoryStream;
    * q82 is the batch-equivalent with a DuckDB oracle.
    */
  /** `joinType` "inner" (default) or "leftOuter": the outer form emits a
    * null-view row for an unmatched purchase once the watermark passes
    * its join horizon — i.e. Spark PROVES no matching view can still
    * arrive before emitting the negative, which is why outer stream-stream
    * joins require both watermarks and the event-time bound.
    */
  def intervalJoinStreams(purchases: DataFrame, views: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour").as("p")
    val v = views.withWatermark("ts", "2 hours").as("v")
    p.join(v, expr(
        "p.user_id = v.user_id AND v.ts >= p.ts - INTERVAL 30 MINUTES AND v.ts <= p.ts"),
        joinType)
      .select(col("p.event_id").as("purchase_id"), col("p.user_id").as("user_id"),
        col("v.event_id").as("view_id"), col("v.value").as("view_value"))
  }

  // q82 — batch-equivalent of the stream-stream interval join: every
  // purchase attributed to the same user's views in the preceding 30
  // minutes. One shuffle on user_id; the time bound is a join predicate,
  // not a post-filter on a wider join.
  val q82: QueryDef = QueryDef.sql(
    "q82_interval_join",
    """SELECT p.event_id AS purchase_id, p.user_id AS user_id,
      |  count(*) AS n_views, round(sum(v.value), 2) AS view_value
      |FROM events p JOIN events v
      |  ON p.user_id = v.user_id
      | AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
      |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
      |GROUP BY p.event_id, p.user_id
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("value"))
    p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("p_ts"))
      .groupBy("purchase_id", "user_id")
      .agg(count(lit(1)).as("n_views"), round(sum("value"), 2).as("view_value"))
      .orderBy("purchase_id")
  }

  // q83 — Spark's NATIVE session_window operator (the built-in
  // counterpart of q81's hand-rolled state machine): 30-min-gap sessions
  // per user in one groupBy — at scale one shuffle on (user_id), with
  // session merging handled by the operator. The oracle derives the same
  // sessions from the SQL lag/cumsum formulation; Spark's session end =
  // last event + gap by definition, mirrored in SQL.
  val q83: QueryDef = QueryDef.sql(
    "q83_session_window",
    """WITH e AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")
  }

  /** q83's native session_window as a TRUE streaming query: watermarked
    * append-mode sessions whose state the operator itself merges — when a
    * late-but-within-watermark event lands between two open sessions and
    * bridges the gap, the operator collapses them into one (asserted by
    * the streaming spec; the batch oracle can't observe merge behavior).
    * A session emits once the watermark proves no event can extend it.
    */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** STREAMING heavy hitters — q76's live sibling: one BOUNDED
    * frequent-items sketch per event-time window (approx_top_k's
    * DataSketches buffer rides in the state store), updated
    * incrementally under the watermark. A window's top-k is
    * continuously current while state stays O(windows × budget)
    * regardless of item cardinality — the only shape that survives an
    * unbounded item domain on an infinite stream; a per-(window, item)
    * count table would grow with distinct items and still need a
    * post-hoc rank. Update mode: each batch re-emits the windows it
    * touched; per-window results equal the batch sketch over the same
    * rows (StreamingSpec).
    */
  def heavyHittersStream(events: DataFrame, item: String = "user_id",
      k: Int = 5, budget: Int = 8192,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(expr(s"approx_top_k($item, $k, $budget)").as("tk"))
      .select(col("w.start").as("win_start"),
        posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("win_start"), (col("pos") + 1).cast("int").as("rank"),
        col("e.item").as("item"), col("e.count").as("cnt"))

  case class HourAnomaly(event_type: String, hr_us: Long, cnt: Long,
      n24: Int, mean24: Option[Double], z: Option[Double], is_anomaly: Boolean)
  /** Per-type state: hours still open (start-µs → count) and the last 24
    * CLOSED hourly counts in close order — exactly q96's trailing frame.
    */
  case class TypeState(open: Map[Long, Long], history: List[(Long, Long)])

  private val HourUs = 3600000000L

  /** STREAMING anomaly detection — q96's verdict as events ARRIVE: one
    * stateful operator per event_type accumulates open hourly counts and,
    * when the watermark passes an hour's end, closes it in hour order,
    * z-scoring against the trailing 24 previously-closed hours (the same
    * exact-integer-moment formula as q96, so closed rows equal the batch
    * rows bit-for-bit). State is bounded: ≤ watermark-horizon open hours
    * + a 24-deep history ring per type. Emission depends only on
    * event-time and watermark progress — batch-split independence is
    * spec-asserted (StreamingSpec).
    */
  def anomalyStream(events: DataFrame, watermark: String = "2 hours"): Dataset[HourAnomaly] = {
    import events.sparkSession.implicits._
    events
      // keep the watermark column itself through the projection — the
      // stateful operator needs the event-time watermark attached to an
      // input column, not just declared upstream
      .select(col("event_type"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .withWatermark("ts", watermark)
      .as[(String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TypeState, HourAnomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, batch: Iterator[(String, Timestamp, Long)], state: GroupState[TypeState]) =>
          // a group's function only runs when the group has rows in the
          // batch OR its event-time timeout fired — the timeout is what
          // closes a quiet type's hours, set to the earliest open hour's
          // end each time
          val st = state.getOption.getOrElse(TypeState(Map.empty, Nil))
          var open = st.open
          batch.foreach { case (_, _, tsUs) =>
            val hr = tsUs - java.lang.Math.floorMod(tsUs, HourUs)
            open = open.updated(hr, open.getOrElse(hr, 0L) + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closing, stillOpen) = open.partition { case (hr, _) => hr + HourUs <= wmUs }
          var history = st.history
          val out = closing.toList.sortBy(_._1).map { case (hr, cnt) =>
            val n24 = history.length
            val s = history.map(_._2).sum
            val ss = history.map(h => h._2 * h._2).sum
            val mean = if (n24 >= 2) Some(s.toDouble / n24) else None
            val v = if (n24 >= 2) Some((ss - s.toDouble * s / n24) / (n24 - 1)) else None
            val z = v.filter(_ > 0).map(vv => (cnt - mean.get) / math.sqrt(vv))
            history = (history :+ ((hr, cnt))).takeRight(24)
            HourAnomaly(etype, hr, cnt, n24, mean, z, z.exists(_ > 3))
          }
          state.update(TypeState(stillOpen, history))
          if (stillOpen.nonEmpty)
            state.setTimeoutTimestamp((stillOpen.keys.min + HourUs) / 1000L)
          out.iterator
      }
  }

  case class ArrEv(user_id: Long, event_id: Long, ts_us: Long, event_type: String)
  case class LateFlag(user_id: Long, event_id: Long, event_type: String, is_late: Boolean)

  /** STREAMING face of q134: per-user event-time high-water mark kept in
    * mapGroups state, each arriving event flagged late-or-not AS IT
    * ARRIVES (the live audit of what a watermark would drop). State per
    * user is ONE long (the HWM) — constant per key at any scale. The
    * per-batch sort by event_id replays the arrival sequence within a
    * batch; cross-batch arrival order is the source's responsibility
    * (q81's contract). Spec asserts per-type late counts equal batch
    * q134 on the same rows across arbitrary batch splits.
    */
  def lateFlagsStream(events: Dataset[ArrEv],
      delayUs: Long = WatermarkDelayUs): Dataset[LateFlag] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, LateFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[ArrEv], state: GroupState[Long]) =>
          var hwm = state.getOption.getOrElse(Long.MinValue)
          val out = List.newBuilder[LateFlag]
          batch.toArray.sortBy(_.event_id).foreach { e =>
            out += LateFlag(uid, e.event_id, e.event_type,
              hwm != Long.MinValue && e.ts_us < hwm - delayUs)
            if (e.ts_us > hwm) hwm = e.ts_us
          }
          state.update(hwm)
          out.result().iterator
      }
  }

  // q134 — WATERMARK / LATE-DATA accounting: the batch face of what a
  // streaming watermark DROPS. Arrival order is the per-user event_id
  // sequence; an event is late when its event time sits more than the
  // watermark delay behind that user's high-water mark at arrival
  // (max event time over the user's earlier arrivals). The window
  // partitions on user_id — per-key watermarks, never a global arrival
  // sort — so the one exchange is the same user-keyed shuffle every
  // sessionization query pays, and the rollup to event_type moves
  // O(types) rows. Feeding a pipeline, this is the audit that says how
  // much data a `withWatermark(delay)` stream would silently lose at
  // each delay setting.
  private val WatermarkDelayUs = 600000000L // 10 min
  val q134: QueryDef = QueryDef.sql(
    "q134_late_events",
    s"""WITH w AS (
      |  SELECT event_type, user_id, epoch_us(ts) AS tus,
      |    max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      |  FROM events)
      |SELECT event_type,
      |  count(*) FILTER (WHERE hwm IS NOT NULL
      |    AND tus < hwm - $WatermarkDelayUs) AS n_late,
      |  count(*) AS n_events,
      |  CAST(count(*) FILTER (WHERE hwm IS NOT NULL
      |    AND tus < hwm - $WatermarkDelayUs) AS DOUBLE) / count(*) AS late_frac
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val arrival = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val isLate = col("hwm").isNotNull &&
      col("ts_us") < col("hwm") - lit(WatermarkDelayUs)
    Tables.events(s, d)
      .withColumn("hwm", max("ts_us").over(arrival))
      .groupBy("event_type")
      .agg(
        count(when(isLate, 1)).as("n_late"),
        count(lit(1)).as("n_events"))
      .withColumn("late_frac", col("n_late").cast("double") / col("n_events"))
      .orderBy("event_type")
  }

  /** Live occupancy gauge — q179's streaming face. Each event opens a
    * `sessionLen` session, so the count of events in a sliding window of
    * EXACTLY that length is the number of sessions still open at the
    * window's end instant (the census q179 computes in batch, here
    * sampled every `slide`). Sliding windows are Spark's native
    * windowed-aggregation state — no custom state machine, watermark
    * bounds it — and each event lands in len/slide windows, so state is
    * O(active windows), never O(events). The sampled gauge is a LOWER
    * bound on q179's exact peak (the true max can fall between sample
    * instants) — asserted against the batch answer in StreamingSpec.
    */
  def occupancyStream(events: DataFrame, sessionLen: String = "30 minutes",
      slide: String = "5 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), sessionLen, slide).as("w"))
      .agg(count(lit(1)).as("open_sessions"))
      .select(col("w.end").as("sampled_at"), col("open_sessions"))

  // q200 — EWMA SMOOTHING of the hourly event rate (the monitoring
  // staple between q96's flat trailing window and q147's seasonal
  // baseline: an exponentially-weighted level that tracks drift without
  // forgetting abruptly). Decay α = 1/2, so every weight is 2^-k —
  // EXACT in IEEE doubles (the q160 sqrt trick's sibling: pick the
  // constant whose float behavior is specified), making each weighted
  // term x·2^-k an exact scaling; only the SUM is multi-term and gets
  // the house rounding. Gap-aware: weights decay per elapsed HOUR
  // (0.5^(t−i)), not per observed row, so sparse types smooth
  // correctly. Scale shape: the corpus collapses to O(types·hours)
  // hourly counts in one map-side-combined shuffle; the triangular
  // (i ≤ t) self-join and the per-(type, t) aggregation run on that
  // BOUNDED table — hours grow with wall-clock time, never with corpus
  // volume, and a 90-day horizon keeps the pair table over it
  // cluster-trivial. The oracle replays count + join + weighted sum
  // hash-exactly.
  val q200: QueryDef = QueryDef.sql(
    "q200_ewma_hourly",
    """WITH h AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |e AS (
      |  SELECT t.event_type, t.hour_idx, t.n,
      |    round(sum(i.n * power(0.5, t.hour_idx - i.hour_idx)), 6) AS ewma
      |  FROM h t JOIN h i
      |    ON i.event_type = t.event_type AND i.hour_idx <= t.hour_idx
      |  GROUP BY t.event_type, t.hour_idx, t.n)
      |SELECT event_type, hour_idx, n, ewma,
      |  n / ewma AS ratio
      |FROM e
      |ORDER BY event_type, hour_idx""".stripMargin) { (s, d) =>
    val h = Tables.events(s, d)
      .select(col("event_type"), expr("ts_us div 3600000000").as("hour_idx"))
      .groupBy("event_type", "hour_idx")
      .agg(count(lit(1)).as("n"))
    val t = h.select(col("event_type"), col("hour_idx"), col("n"))
    val i = h.select(col("event_type").as("iet"), col("hour_idx").as("ih"),
      col("n").as("in"))
    t.join(i, col("iet") === col("event_type") &&
        col("ih") <= col("hour_idx"))
      .groupBy("event_type", "hour_idx", "n")
      .agg(round(sum(col("in") *
        pow(lit(0.5), col("hour_idx") - col("ih"))), 6).as("ewma"))
      .select(col("event_type"), col("hour_idx"), col("n"), col("ewma"),
        (col("n") / col("ewma")).as("ratio"))
      .orderBy("event_type", "hour_idx")
  }

  // q206 — time-weighted average value per user (TWAP — the
  // irregular-sampling mean: events arrive when they arrive, so the
  // arithmetic mean over-weights bursts; each observation must count for
  // the INTERVAL it was the user's current value, the convention every
  // billing meter, position book, and gauge store uses). Per user, value
  // v_i holds over [t_i, t_{i+1}): twap = Σ v_i·Δt_i / Σ Δt_i with the
  // last observation dropped (no interval to hold over; single-event
  // users carry no interval at all and are excluded by the same rule).
  // Money rides the cents grid (q104's discipline) and Δt is exact
  // epoch-µs, so the weighted sum accumulates as DECIMAL(38,0) /
  // HUGEINT — cents·µs products overflow int64 at real spans, the exact
  // wide-integer sum is order-insensitive, and the only doubles are the
  // final correctly-rounded casts feeding one division chain in
  // identical operand order. Scale shape: ONE user-keyed exchange serves
  // both the lead() window and the per-user aggregate (same key — no
  // re-shuffle), per-user TWAPs collapse to the bounded integer-bucket
  // histogram, so output is O(value range), never O(users).
  val q206: QueryDef = QueryDef.sql(
    "q206_time_weighted_avg",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |seg AS (
      |  SELECT user_id, cents,
      |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS dt
      |  FROM e),
      |u AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(cents AS HUGEINT) * dt) AS DOUBLE)
      |      / CAST(sum(dt) AS DOUBLE) / 100 AS twap
      |  FROM seg WHERE dt IS NOT NULL GROUP BY user_id)
      |SELECT CAST(floor(twap) AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS users,
      |  round(avg(twap), 6) AS avg_twap
      |FROM u
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("ts_us"), expr("cast(round(value * 100) as bigint)").as("cents"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val seg = e.withColumn("dt", lead("ts_us", 1).over(w) - col("ts_us"))
      .filter(col("dt").isNotNull)
    val u = seg.groupBy("user_id")
      .agg((sum(col("cents").cast("decimal(38,0)") * col("dt")).cast("double")
        / sum("dt").cast("double") / lit(100)).as("twap"))
    u.groupBy(floor(col("twap")).cast("long").as("bucket"))
      .agg(count(lit(1)).as("users"), round(avg("twap"), 6).as("avg_twap"))
      .orderBy("bucket")
  }

  /** Baseline-histogram literals for the PSI monitor: the frozen
    * reference distribution driver-reads ONCE (bounded — a 500-cent
    * bucket histogram, the same model-artifact class as k-means
    * centroids) and embeds as expression literals, so the stream join
    * against it is a pure map lookup inside one projection — no
    * stream-static join, no shuffle, nothing to re-read per batch.
    * Returns (map literal SQL, keys array literal SQL, total count).
    */
  private def psiBaselineLiterals(baseline: DataFrame): (String, String, Long) = {
    val rows = baseline.select(col("b").cast("long"), col("c").cast("long"))
      .take(1 << 16)
    require(rows.nonEmpty, "PSI baseline histogram is empty")
    require(rows.length < (1 << 16), "PSI baseline histogram driver overflow")
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val mapLit = pairs.map { case (k, v) => s"${k}L, ${v}L" }
      .mkString("map(", ", ", ")")
    val keysLit = pairs.map(p => s"${p._1}L").mkString("array(", ", ", ")")
    (mapLit, keysLit, pairs.map(_._2).sum)
  }

  /** The PSI projection SHARED verbatim by the streaming monitor and its
    * batch replay (the fertilityMonitorStream/bpeFlatMerges discipline:
    * equality holds because both faces evaluate literally the same
    * expression). Input rows carry `w` (window struct), `ents`
    * (array<struct<b,c>> — the window's bucket histogram, order
    * IRRELEVANT: every per-bucket term quantizes onto the 1e-9 grid
    * before an integer sum, q213's order-free determinism) and
    * `n_events`. Smoothing is q213's +1 Laplace, with the domain = the
    * union of the baseline's buckets and the window's (per-window — the
    * streaming analogue of q213's corpus-global domain, stated in the
    * contract).
    */
  private def psiProject(perWin: DataFrame, m0: String, ks0: String,
      n0: Long, warnAt: Double, alertAt: Double): DataFrame = {
    val p = "cast(coalesce(element_at(mw, k), 0L) + 1 as double)" +
      " / cast(n_events + bs as double)"
    val p0 = s"cast(coalesce(element_at(m0, k), 0L) + 1 as double)" +
      s" / cast(${n0}L + bs as double)"
    perWin
      .withColumn("mw", expr("map_from_entries(ents)"))
      .withColumn("m0", expr(m0))
      .withColumn("ks", expr(s"array_union($ks0, transform(ents, e -> e.b))"))
      .withColumn("bs", expr("cast(size(ks) as bigint)"))
      .withColumn("psi", expr(
        s"""round(cast(aggregate(ks, 0L, (acc, k) -> acc +
           |  cast(round(1000000000.0D * (($p - $p0) * ln(($p) / ($p0))))
           |    as bigint)) as double) / 1000000000.0D, 6)""".stripMargin))
      .select(col("w.start").as("win_start"), col("n_events"), col("psi"),
        when(col("psi") >= alertAt, "alert")
          .when(col("psi") >= warnAt, "warn").otherwise("ok").as("status"),
        (col("psi") >= alertAt).as("alert"))
  }

  /** The (window × 500-cent-bucket) count table both PSI faces reduce
    * from — q213's bucket contract. Also the helper that builds a FROZEN
    * baseline histogram from a trusted batch slice (`groupBy(b).count`).
    */
  def valueBucketHistogram(events: DataFrame): DataFrame =
    events.withColumn("b", expr("cast(round(value * 100) as bigint) div 500"))
      .groupBy("b").agg(count(lit(1)).as("c"))

  /** STREAMING PSI drift monitor — q213's pager-signal face: the
    * population stability index of each event-time window's value
    * distribution against a FROZEN baseline histogram (the trusted
    * reference slice a risk team freezes, where batch q213 uses week 0),
    * emitted ONCE per window when the watermark closes it (append mode —
    * the monitor alerts on final numbers, not provisional ones). The
    * 0.1 warn / 0.25 alert defaults are the thresholds the PSI
    * literature standardizes.
    *
    * Scale shape: two CHAINED stateful aggregations (Spark's
    * multiple-stateful-operator support): (window, bucket) counts —
    * state O(open windows × bounded buckets) — then the per-window
    * histogram roll-up via collect_list over the BOUNDED bucket rows
    * (never raw events; the list a window carries is ≤ |bucket domain|).
    * The baseline rides as expression literals (bounded driver artifact)
    * so no per-batch join or shuffle touches it. PSI math is shared
    * verbatim with [[psiAgainstBaseline]] — StreamingSpec proves
    * streamed == batch per closed window and both alert polarities.
    */
  def psiDriftStream(events: DataFrame, baseline: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours",
      warnAt: Double = 0.1, alertAt: Double = 0.25): DataFrame = {
    val (m0, ks0, n0) = psiBaselineLiterals(baseline)
    val counts = events.withWatermark("ts", watermark)
      .withColumn("b", expr("cast(round(value * 100) as bigint) div 500"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("b"))
      .agg(count(lit(1)).as("c"))
    val perWin = counts
      // re-window on the window struct — the documented chained-
      // aggregation form that keeps event-time semantics attached
      .groupBy(window(col("w"), windowLen).as("w"))
      .agg(collect_list(struct(col("b"), col("c"))).as("ents"),
        sum("c").as("n_events"))
    psiProject(perWin, m0, ks0, n0, warnAt, alertAt)
  }

  /** Batch replay of [[psiDriftStream]] on the same rows — the spec's
    * equality reference and the backfill face (PSI over historical
    * windows against the same frozen baseline).
    */
  def psiAgainstBaseline(events: DataFrame, baseline: DataFrame,
      windowLen: String = "1 hour",
      warnAt: Double = 0.1, alertAt: Double = 0.25): DataFrame = {
    val (m0, ks0, n0) = psiBaselineLiterals(baseline)
    val counts = events
      .withColumn("b", expr("cast(round(value * 100) as bigint) div 500"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("b"))
      .agg(count(lit(1)).as("c"))
    val perWin = counts.groupBy(window(col("w"), windowLen).as("w"))
      .agg(collect_list(struct(col("b"), col("c"))).as("ents"),
        sum("c").as("n_events"))
    psiProject(perWin, m0, ks0, n0, warnAt, alertAt)
  }

  /** q234's treatment-arm hash, shared verbatim by the batch SRM check
    * and the streaming monitor: arm = ((user_id % 1000003) · 2654435761)
    * % 2 — deterministic, balanced by construction on uniform ids.
    */
  private def armCol: org.apache.spark.sql.Column =
    col("user_id") % 1000003L * 2654435761L % 2L

  /** The SRM chi-square projection SHARED verbatim by the streaming
    * monitor and its batch replay (the psiProject discipline): rows
    * carry `w` (window struct), `n_a`, `n_b`; chi2 = (n_a−n_b)²/N off
    * exact integers, rounded once; the flag follows q234's boundary
    * discipline (1e-6-grid integer vs the literal χ²₁(0.05)).
    */
  private def srmProject(c: DataFrame): DataFrame = {
    val chi2raw = ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
      .cast("double") / (col("n_a") + col("n_b"))
    c.select(col("w.start").as("win_start"), col("n_a"), col("n_b"),
      round(chi2raw, 6).as("chi2"),
      (round(lit(1000000.0) * chi2raw).cast("bigint") >= 3841459L)
        .as("srm_flag"))
  }

  /** STREAMING sample-ratio-mismatch monitor — q234's pager-signal face
    * (the experiment-platform pre-gate run on LIVE exposure events: a
    * biased assignment poisons every downstream readout, so the alarm
    * must fire while the experiment runs, not at the batch readout).
    * Per event-time window: the chi-square of the window's DISTINCT
    * exposed users' realized arm split against the designed 50/50,
    * emitted once when the watermark closes the window (append — alerts
    * on final counts). Input contract: rows with event-time `ts` and
    * `user_id`.
    *
    * Scale shape: two chained stateful operators — watermarked
    * dedup on (window, user) (state O(open windows × window-distinct
    * users), evicted at close: the key includes the event-time window)
    * feeding the windowed count aggregate (state O(open windows)). The
    * chi2/flag math is [[srmProject]], shared verbatim with the batch
    * replay — ExperimentStreamSpec proves streamed == batch per closed
    * window and both alert polarities.
    */
  def srmStream(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val dedup = events.withWatermark("ts", watermark)
      .select(window(col("ts"), windowLen).as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
    val c = dedup
      .groupBy(window(col("w"), windowLen).as("w"))
      .agg(sum(when(armCol === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(armCol === 1L, 1L).otherwise(0L)).as("n_b"))
    srmProject(c)
  }

  /** Batch replay of [[srmStream]] on the same rows — the spec's
    * equality reference and the backfill face (per-window SRM over
    * historical exposure logs; q234 itself is the whole-corpus +
    * per-segment variant).
    */
  def srmPerWindow(events: DataFrame, windowLen: String = "1 hour"): DataFrame = {
    val dedup = events
      .select(window(col("ts"), windowLen).as("w"), col("user_id"))
      .distinct()
    val c = dedup.groupBy(col("w"))
      .agg(sum(when(armCol === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(armCol === 1L, 1L).otherwise(0L)).as("n_b"))
    srmProject(c)
  }

  /** The K=5 O'Brien–Fleming readout SHARED verbatim by the streaming
    * monitor and its batch replay: rows carry `k` (0-based look) and the
    * CUMULATIVE-through-look-k counts (na, nb, ca, cb); the pooled
    * two-proportion z runs off the exact integers and the crossing
    * decision is q235's 1e-9-grid integer-vs-literal convention with the
    * same precomputed boundary table (2.040·√(5/k̂), k̂ = k+1).
    */
  private def obfProject(g: DataFrame): DataFrame = {
    val pPool = (col("ca") + col("cb")).cast("double") /
      (col("na") + col("nb")).cast("double")
    // degenerate looks pin z = 0 (no alert): no conversions, all
    // conversions, or an EMPTY ARM — na/nb = 0 would make ca/na NaN and
    // a NaN z turns `crossed` into NULL, silently breaking boolean
    // consumers of the alert flag
    val zv = when(col("ca") + col("cb") === 0 ||
        col("ca") + col("cb") === col("na") + col("nb") ||
        col("na") === 0 || col("nb") === 0, 0.0)
      .otherwise(
        (col("ca").cast("double") / col("na")
          - col("cb").cast("double") / col("nb"))
          / sqrt(pPool * (lit(1.0) - pPool)
            * (lit(1.0) / col("na") + lit(1.0) / col("nb"))))
    val bound = when(col("k") === 0, 4.561578674)
      .when(col("k") === 1, 3.225523213)
      .when(col("k") === 2, 2.633628675)
      .when(col("k") === 3, 2.280789337)
      .otherwise(2.040)
    val crit9 = when(col("k") === 0, 4561578674L)
      .when(col("k") === 1, 3225523213L)
      .when(col("k") === 2, 2633628675L)
      .when(col("k") === 3, 2280789337L)
      .otherwise(2040000000L)
    g.select((col("k") + 1).as("look"),
      (col("na") + col("nb")).as("n_cum"),
      (col("ca") + col("cb")).as("conv_cum"),
      round(zv, 6).as("z"), bound.as("bound"),
      (abs(round(lit(1000000000.0) * zv).cast("bigint")) >= crit9)
        .as("crossed"))
  }

  /** Per-record look fan-out shared by both OBF faces: a unit entering
    * at look j contributes to every cumulative look k ≥ j (≤5 rows,
    * map-side — q122's tagged-union shape turned temporal), and each
    * tagged row is re-timestamped to the END of look k so a windowed
    * aggregate on `ts_k` holds exactly the cumulative-through-k counts
    * and (in the streaming face) closes precisely when look k's data is
    * complete.
    */
  private def obfFanOut(convs: DataFrame, expStartUs: Long,
      lookLenUs: Long): DataFrame =
    convs
      // integer `div` (not a double floor) — exact at any epoch offset;
      // entries before expStart clamp into look 0. Units entering AFTER
      // the last look carry no look rows (k = −1 passthrough, filtered
      // after the watermark node) but MUST still flow through it: every
      // in-experiment ts_k is capped at look 5's end, so only
      // post-experiment traffic can advance the watermark far enough to
      // close the final look.
      .withColumn("j", greatest(lit(0L),
        expr(s"(unix_micros(ts) - ${expStartUs}L) div ${lookLenUs}L")))
      .withColumn("k", explode(when(col("j") <= 4L,
        expr("sequence(j, cast(4 as bigint))")).otherwise(array(lit(-1L)))))
      // ts_k is wrapped KnownNullable: the streaming face's watermark
      // guard is an `OR ts_k IS NULL` disjunct whose unpushability is
      // the point — if the source's ts is non-nullable, a bare CaseWhen
      // would infer ts_k non-nullable, NullPropagation would fold the
      // IsNull to false, and `k >= 0` alone would be pushed below the
      // EventTimeWatermark node (killing the k = −1 passthrough rows
      // that close the final look). The tag makes the guard independent
      // of input nullability; eval/codegen pass straight through.
      .withColumn("ts_k", org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.KnownNullable(
          org.apache.spark.sql.GraftBridge.expression(
            when(col("k") >= 0L, expr(
              s"timestamp_micros(${expStartUs}L + (k + 1) * ${lookLenUs}L - 1)"))
              .otherwise(col("ts"))))))

  /** STREAMING group-sequential (O'Brien–Fleming) monitor — q235's
    * pager-signal face: the sequential-testing platform's live readout
    * that pages the moment a look's boundary is crossed instead of at
    * the batch analysis. Input contract: ONE record per experiment unit
    * (user) — event-time `ts` = the unit's entry, `user_id` (the arm
    * hash is q234's), `conv` ∈ {0,1} — i.e. the attributed conversion
    * records the funnel pipeline emits upstream. The look schedule is
    * CONFIGURED (expStart + 5 equal looks of lookLen), the production
    * contract for a live monitor — batch q235 derives its looks from the
    * observed entry range instead, which no stream can know in advance.
    *
    * Each record fans out to its cumulative looks ([[obfFanOut]], ≤5
    * bounded tagged rows) re-timestamped to each look's end, so ONE
    * watermarked windowed aggregate (state: ≤5 open look windows × 4
    * counters) emits look k's CUMULATIVE counts exactly when the
    * watermark passes look k's end — append-mode finals, no
    * cross-window state operator, no flatMapGroupsWithState after
    * aggregation (unsupported), no per-unit state. The z/boundary math
    * is [[obfProject]], shared verbatim with the batch replay;
    * ExperimentStreamSpec proves streamed == batch per closed look and
    * both alert polarities.
    */
  def obfMonitorStream(convs: DataFrame, expStart: Timestamp,
      lookLenUs: Long, watermark: String = "2 hours"): DataFrame = {
    val winStr = s"$lookLenUs microseconds"
    val g = obfFanOut(convs, expStart.getTime * 1000L, lookLenUs)
      .withWatermark("ts_k", watermark)
      // the `OR ts_k IS NULL` disjunct is vacuous at runtime (ts_k is
      // never null) but load-bearing: an AND conjunct gets split and
      // `k >= 0` alone pushed below the EventTimeWatermark node
      // (measured — the k = −1 passthrough rows then die before the
      // watermark stats and the final look never closes); an OR
      // referencing the watermark column is unsplittable and unpushable,
      // so the passthrough rows advance the watermark before being
      // dropped. ts_k carries a KnownNullable tag (see obfFanOut) so
      // NullPropagation can never fold the disjunct away, whatever the
      // source's ts nullability
      .filter(col("k") >= 0L || col("ts_k").isNull)
      .groupBy(window(col("ts_k"), winStr).as("w"), col("k"))
      .agg(sum(when(armCol === 0L, 1L).otherwise(0L)).as("na"),
        sum(when(armCol === 1L, 1L).otherwise(0L)).as("nb"),
        sum(when(armCol === 0L, col("conv")).otherwise(0L)).as("ca"),
        sum(when(armCol === 1L, col("conv")).otherwise(0L)).as("cb"))
    obfProject(g)
  }

  /** Batch replay of [[obfMonitorStream]] on the same rows — the spec's
    * equality reference and the backfill face (the full 5-look table at
    * once, ordered).
    */
  def obfPerLook(convs: DataFrame, expStart: Timestamp,
      lookLenUs: Long): DataFrame = {
    val g = obfFanOut(convs, expStart.getTime * 1000L, lookLenUs)
      .filter(col("k") >= 0L)
      .groupBy(col("k"))
      .agg(sum(when(armCol === 0L, 1L).otherwise(0L)).as("na"),
        sum(when(armCol === 1L, 1L).otherwise(0L)).as("nb"),
        sum(when(armCol === 0L, col("conv")).otherwise(0L)).as("ca"),
        sum(when(armCol === 1L, col("conv")).otherwise(0L)).as("cb"))
    obfProject(g).orderBy("look")
  }

  val all: Seq[QueryDef] = Seq(q80, q81, q82, q83, q134, q200, q206)
}
