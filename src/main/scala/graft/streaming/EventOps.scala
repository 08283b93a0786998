package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema (SURVEY.md
  * §2.10 T1–T7). Every transform is expressed against an unbounded
  * DataFrame — the same code runs on `spark.readStream` input (streaming)
  * and on `Tables.events` (batch twin, which is what the DuckDB-checked
  * Q22 uses, since watermark semantics have no SQL oracle).
  *
  * Scale posture: watermarks bound all state; windowed aggregates are
  * partial-aggregated before the shuffle like any groupBy; the arbitrary-
  * state op keys by user_id so state shards across executors.
  */
object EventOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  /** T4: 10-minute watermark — late rows dropped once event time passes. */
  def withLateness(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** T1: tumbling 1-hour counts per event type (append-able once
    * watermarked). */
  def tumblingCounts(events: DataFrame): DataFrame =
    withLateness(events)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_val"))

  /** T2: sliding 1-hour window every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    withLateness(events)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** T3: 30-minute session windows per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    withLateness(events)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_val"))

  /** T5: stateful dedup by event_id with bounded state. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    withLateness(events).dropDuplicatesWithinWatermark("event_id")

  /** T8: stream-stream interval join — attribute each purchase to any
    * click by the same user in the preceding 30 minutes. BOTH sides
    * carry watermarks and the join condition bounds event time in both
    * directions, which is what lets Spark expire buffered join state:
    * without the time bound the state grows with the stream. The
    * production attribution-join shape at scale.
    *
    * `joinType = "left_outer"` additionally emits unmatched clicks with
    * null purchase columns — but only once the watermark passes the end
    * of the click's join window (that's when "no purchase arrived" is
    * final). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p, col("c_user") === col("p_user") &&
      col("p_ts") >= col("c_ts") &&
      col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"), joinType)
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("value"))
  }

  /** Stream-static enrichment: join the live stream against a batch
    * dimension (no watermark needed — the static side is re-read per
    * micro-batch, so dim updates between batches are picked up; at
    * scale the dim is broadcast when under threshold, exactly as in
    * batch). */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(dim, Seq(key), "left")

  case class UserAgg(user_id: Long, n: Long, total: Double)

  /** T6: arbitrary per-key state — running event count + value sum per
    * user via flatMapGroupsWithState (the lab's "user Reduce over a
    * stream" analog; emits the updated aggregate on every batch). */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserAgg(uid, n, total)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Batch events as the typed Dataset (ns → µs conversion handled by
    * graft.Tables.events). */
  def typedEvents(spark: SparkSession, df: DataFrame): Dataset[Event] = {
    import spark.implicits._
    df.as[Event]
  }

  /** T6 via the Spark 4 arbitrary-state API (`transformWithState`):
    * same running per-user totals as [[runningUserTotals]], expressed as
    * a [[StatefulProcessor]] with an explicit `ValueState` handle.
    * Requires the RocksDB state store provider (set in the writeStream
    * session conf); state is per-key, TTL-capable, and shards across
    * executors like any keyed state. */
  class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserAgg] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var state: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserAgg](
        "totals", Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[UserAgg] = {
      val prev = Option(state.get()).getOrElse(UserAgg(key, 0L, 0.0))
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserAgg(key, n, total)
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserTotalsTws(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class SessionAgg(n: Long, total: Double, lastMs: Long)
  case class SessionClosed(user_id: Long, n: Long, total: Double,
                           last_ts: Timestamp)

  /** T6 with EVENT-TIME TIMERS: gap-based session close as a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]]. Each input
    * batch advances the per-user aggregate and re-arms a timer at
    * `last event time + gap`; when the watermark passes the timer,
    * [[handleExpiredTimer]] emits the closed session once and clears the
    * state — so state size is bounded by ACTIVE sessions, not history,
    * and emission needs no second pass. This is the timer/TTL half of
    * the arbitrary-state surface ([[UserTotalsProcessor]] covers value
    * state); the declarative twin is `session_window` (T3) and the batch
    * twin is q44. */
  class SessionCloseProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionClosed] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var agg: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[SessionAgg](
        "session", Encoders.product[SessionAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[SessionClosed] = {
      // Sessions can close two ways: (a) a later event arrives past
      // last+gap BEFORE the watermark got there — close inline and start
      // a new session; (b) no event ever comes — the armed timer fires.
      // Sorting the batch is per-key per-batch, bounded memory.
      val sorted = rows.toArray.sortBy(_.ts.getTime)
      var cur = Option(agg.get()).getOrElse(SessionAgg(0L, 0.0, Long.MinValue))
      val closed = Seq.newBuilder[SessionClosed]
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (cur.n > 0 && t > cur.lastMs + gapMs) {
          closed += SessionClosed(key, cur.n, cur.total, new Timestamp(cur.lastMs))
          cur = SessionAgg(0L, 0.0, Long.MinValue)
        }
        cur = SessionAgg(cur.n + 1, cur.total + e.value, math.max(cur.lastMs, t))
      }
      // one armed timer per key: re-arm at the new session end
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(cur.lastMs + gapMs)
      agg.update(cur)
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[SessionClosed] = {
      val cur = agg.get()
      agg.clear()
      if (cur == null) Iterator.empty
      else Iterator.single(
        SessionClosed(key, cur.n, cur.total, new Timestamp(cur.lastMs)))
    }
  }

  /** Closed sessions per user, emitted exactly when the watermark passes
    * `last event + gap`. Requires a watermark (event-time timers). */
  def sessionClosesTws(events: Dataset[Event],
                       gapMs: Long = 30L * 60 * 1000,
                       lateness: String = "10 minutes"): Dataset[SessionClosed] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class TotalsTtl(user_id: Long, n: Long, total: Double, expired: Boolean)

  /** State TTL on EVENT TIME (the VERDICT r4 #8 demo): running per-user
    * totals whose state EXPIRES after `ttlMs` of event-time inactivity.
    * `TTLConfig` keys expiry to PROCESSING time — wall-clock, untestable
    * without flaky sleeps and wrong for replay/backfill (state lifetime
    * would depend on how fast the job runs, not on the data). This
    * formulation keeps the TTL semantics but drives it from the
    * WATERMARK: every batch re-arms a timer at `last event time + ttl`;
    * when the watermark passes it, the final aggregate is emitted once
    * with `expired = true` and the state is cleared — so state size is
    * bounded by event-time-active keys, and a replay produces identical
    * results at any speed. A later event for the key starts from zero,
    * exactly like a TTL-evicted entry. */
  class TtlTotalsProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, TotalsTtl] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var agg: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[SessionAgg](
        "ttlTotals", Encoders.product[SessionAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[TotalsTtl] = {
      val prev = Option(agg.get()).getOrElse(SessionAgg(0L, 0.0, Long.MinValue))
      var n = prev.n
      var total = prev.total
      var lastMs = prev.lastMs
      rows.foreach { e => n += 1; total += e.value; lastMs = math.max(lastMs, e.ts.getTime) }
      agg.update(SessionAgg(n, total, lastMs))
      // one armed timer per key: slide the expiry to the newest activity
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(lastMs + ttlMs)
      Iterator.single(TotalsTtl(key, n, total, expired = false))
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[TotalsTtl] = {
      val cur = agg.get()
      agg.clear()
      if (cur == null) Iterator.empty
      else Iterator.single(TotalsTtl(key, cur.n, cur.total, expired = true))
    }
  }

  /** Running totals with event-time state TTL; see [[TtlTotalsProcessor]]. */
  def expiringUserTotals(events: Dataset[Event],
                         ttlMs: Long = 60L * 60 * 1000,
                         lateness: String = "10 minutes"): Dataset[TotalsTtl] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new TtlTotalsProcessor(ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ------------------------------------------------- q142 streaming twin

  /** Funnel input row: `tsm` is event time in MICROseconds (the unit the
    * batch fold compares the conversion window in — millisecond timers
    * are too coarse to reproduce its tie behavior), `code` the funnel
    * stage (1 = view, 2 = click, 3 = purchase). */
  case class FunnelIn(user_id: Long, ts: Timestamp, tsm: Long,
                      event_id: Long, code: Long)
  case class FunnelEv(tsm: Long, event_id: Long, code: Long)

  /** Per-user funnel state: the greedy fold's (depth, anchor) over the
    * FINALIZED prefix, the watermark that prefix runs through
    * (`foldedWm`, ms), and the single armed timer (`armed`, ms; 0 =
    * none). */
  case class FunnelSt(depth: Long, anchor: Long, foldedWm: Long,
                      armed: Long)
  case class FunnelDepth(user_id: Long, depth: Long)

  /** Event-time streaming twin of q142's per-user window funnel
    * ([[graft.operators.Advanced.funnelDepths]]): greedy
    * view→click→purchase with a `deltaMicros` conversion clock that
    * re-anchors on each accepted stage.
    *
    * The batch fold is order-sensitive (greedy over the ts-sorted event
    * sequence), so a streaming twin cannot fold on arrival — a
    * late-but-in-watermark click arriving after a purchase was folded
    * would change history. Instead arrivals BUFFER in per-user
    * `ListState` and the fold advances only up to the WATERMARK: one
    * timer per user armed at the earliest pending event; when the
    * watermark passes it, every pending event at or before the watermark
    * is folded in (tsm, event_id) order — exactly the batch sort key —
    * onto the persisted (depth, anchor). Because watermark slices are
    * time-contiguous and processed in order, the incremental fold equals
    * the batch fold over the full sequence (golden-pinned in
    * StreamingSpec at sf0.001).
    *
    * Emission: one [[FunnelDepth]] row per DEPTH CHANGE (append mode);
    * depth is monotone, so `max(depth)` per user over the output is the
    * user's current depth. Users that never pass stage 1 emit nothing —
    * absent means depth 0 (the report twin counts them from the user
    * universe). State bounds: code-0 events are dropped before the
    * shuffle; a user reaching depth 3 is terminal — buffer cleared,
    * timer disarmed, later events ignored; otherwise pending holds only
    * events newer than the watermark (the lateness horizon). Rows at or
    * before the folded watermark are late beyond the declared lateness
    * and are dropped, the standard watermark contract. */
  class FunnelDepthProcessor(deltaMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FunnelIn, FunnelDepth] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[FunnelSt] = _
    @transient private var pending: ListState[FunnelEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[FunnelSt](
        "funnel", Encoders.product[FunnelSt], TTLConfig.NONE)
      pending = getHandle.getListState[FunnelEv](
        "pending", Encoders.product[FunnelEv], TTLConfig.NONE)
    }

    private def cur(): FunnelSt =
      Option(st.get()).getOrElse(FunnelSt(0L, 0L, Long.MinValue, 0L))

    override def handleInputRows(key: Long, rows: Iterator[FunnelIn],
                                 timers: TimerValues): Iterator[FunnelDepth] = {
      val c = cur()
      if (c.depth >= 3L) return Iterator.empty // terminal
      var minMs = Long.MaxValue
      rows.foreach { r =>
        val ms = r.tsm / 1000
        if (ms > c.foldedWm) { // else: late beyond the folded watermark
          pending.appendValue(FunnelEv(r.tsm, r.event_id, r.code))
          if (ms < minMs) minMs = ms
        }
      }
      if (minMs != Long.MaxValue && (c.armed == 0L || minMs < c.armed)) {
        if (c.armed != 0L) getHandle.deleteTimer(c.armed)
        getHandle.registerTimer(minMs)
        st.update(c.copy(armed = minMs))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[FunnelDepth] = {
      val wm = timers.getCurrentWatermarkInMs()
      val c = cur()
      val all = pending.get().toArray
      val (ready, rest) = all.partition(_.tsm / 1000 <= wm)
      var depth = c.depth
      var anchor = c.anchor
      ready.sortBy(e => (e.tsm, e.event_id)).foreach { e =>
        if (e.code == depth + 1 &&
            (depth == 0L || e.tsm <= anchor + deltaMicros)) {
          depth += 1; anchor = e.tsm
        }
      }
      pending.clear()
      if (depth >= 3L) { // terminal: drop the buffer, no more timers
        st.update(FunnelSt(depth, anchor, wm, 0L))
      } else {
        if (rest.nonEmpty) pending.appendList(rest)
        val armed = if (rest.nonEmpty) rest.map(_.tsm / 1000).min else 0L
        if (armed != 0L) getHandle.registerTimer(armed)
        st.update(FunnelSt(depth, anchor, wm, armed))
      }
      if (depth > c.depth) Iterator.single(FunnelDepth(key, depth))
      else Iterator.empty
    }
  }

  /** q142's per-user funnel depth over an unbounded event stream; see
    * [[FunnelDepthProcessor]]. */
  def funnelDepthsTws(events: DataFrame,
                      deltaMicros: Long = 3L * 24 * 3600 * 1000000,
                      lateness: String = "10 minutes"): Dataset[FunnelDepth] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.withWatermark("ts", lateness)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsm"),
        col("event_id"),
        when(col("event_type") === "view", 1L)
          .when(col("event_type") === "click", 2L)
          .when(col("event_type") === "purchase", 3L)
          .otherwise(0L).as("code"))
      .where(col("code") > 0) // stage-less events are fold no-ops: drop pre-shuffle
      .as[FunnelIn]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelDepthProcessor(deltaMicros),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ------------------------------------------------- q147 streaming twin

  /** DAU stream — q147's daily-active-users half in event time: distinct
    * (user, day) via watermarked streaming dedup, then a 1-day tumbling
    * count. Two chained stateful operators in append mode; dedup state
    * expires with the watermark, so state is bounded by the lateness
    * horizon of daily-active pairs, not history. The watermark re-derives
    * on the DAY-truncated column: day granularity means the effective
    * lateness floor is one day (a day-boundary straggler is at most one
    * day late on `day_ts`), hence the `1 day` default. */
  def dailyActiveUsers(events: DataFrame,
                       lateness: String = "1 day"): DataFrame =
    events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day_ts"))
      .withWatermark("day_ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "day_ts")
      .groupBy(window(col("day_ts"), "1 day"))
      .agg(count(lit(1)).as("dau"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("dau"))

  /** WAU stream — q147's trailing-7-day half, by the SAME cover
    * inversion as the batch query: each (user, activity day) is exploded
    * scan-locally to the ≤ 7 future days it covers, the cover rows are
    * streaming-deduped on (user, cover day), and a 1-day tumbling count
    * yields WAU — never a range join of event-sized relations, never a
    * per-day distinct-user set in state.
    *
    * The cover shift moves event time FORWARD up to 6 days, so the
    * watermark on `cover_ts` must absorb that horizon before real
    * lateness: an on-time activity row's EARLIEST cover day trails the
    * maximum observed cover day by up to 6 days + day granularity —
    * hence the `8 days` default (6-day horizon + 1-day granularity +
    * 1-day slack). That is the price of the inversion, paid in state
    * lifetime (8 days of distinct (user, day) pairs), not in compute
    * shape. Days covered by no same-day activity are cover-only
    * artifacts, exactly as in batch — the consumer joins against
    * [[dailyActiveUsers]] and keeps dau > 0 days (golden-pinned against
    * q147 in StreamingSpec). */
  def weeklyActiveUsers(events: DataFrame,
                        lateness: String = "8 days"): DataFrame =
    events
      .select(col("user_id"), date_trunc("day", col("ts")).as("aday"))
      .select(col("user_id"),
        explode(sequence(col("aday"),
          col("aday") + expr("INTERVAL 6 DAYS"),
          expr("INTERVAL 1 DAY"))).as("cover_ts"))
      .withWatermark("cover_ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "cover_ts")
      .groupBy(window(col("cover_ts"), "1 day"))
      .agg(count(lit(1)).as("wau"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("wau"))
}
