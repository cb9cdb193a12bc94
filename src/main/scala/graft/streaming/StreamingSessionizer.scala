package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Event, SessionState}

/** Per-event output of the stateful pipeline: the event plus everything the
  * reference derived from its Redis state — session identity (ST1/ST2),
  * new-vs-returning (F1/F2), change detection (ST3), purchase
  * carry-forward (ST4) — in one record.
  */
case class SessionizedEvent(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    session_seq: Long,
    session_id: String,
    session_start: Boolean,
    is_new_user: Boolean,
    event_type_changed: Boolean,
    last_purchase_value: Option[Double],
    events_in_session: Long)

/** The streaming heart of the engine: the reference's whole consumer
  * pipeline (StructuredStreaming.scala:79-279) as ONE
  * `flatMapGroupsWithState` query.
  *
  * The reference holds per-user state in an external Redis hash, re-scans
  * the whole keyspace every micro-batch for a stream-static join
  * (StructuredStreaming.scala:144-155), and runs five concurrent streaming
  * queries with independent Kafka reads and unsynchronized batches
  * (:228-273) — a read/write race by construction. Here the state lives in
  * Spark's own state store, keyed by user: one Kafka read, atomic per-key
  * transitions, and at 1000 executors the state for a key never leaves the
  * partition that owns it — no per-batch external scan, no race, no
  * network round-trips per row.
  *
  * Semantics mirrored (with the reference's `sess_is`/`last_visit` typos
  * fixed to the intended behavior, see SURVEY.md §2e):
  *  - new session after a >30-min inactivity gap (:186) — ST2;
  *  - session ids derived from data (`"<user>-<seq>"`), not wall-clock,
  *    so batch and streaming agree bit-for-bit (replaces the
  *    nondeterministic `createNewSessionId`, :283-296) — ST1/U1;
  *  - first-touch state init (:167-178) — ST6;
  *  - change detection against previous state (:190-205) — ST3;
  *  - purchase carry-forward on the qualifying event type (:206-221) — ST4;
  *  - unconditional refresh of the rest (:222-225) — ST5.
  */
object StreamingSessionizer {

  val DefaultGapMinutes = 30L

  private def micros(ts: Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  /** The pure state transition for one user over one micro-batch, shared
    * by the `flatMapGroupsWithState` and `transformWithState` fronts.
    * Returns the per-event outputs and the final state (null iff no
    * events).
    */
  private[graft] def transition(
      gapMinutes: Long,
      userId: Long,
      events: Iterator[Event],
      initial: SessionState): (Array[SessionizedEvent], SessionState) = {
    val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
    var st = initial
    val hadState = st != null
    val gapMicros = gapMinutes * 60L * 1000000L
    val out = sorted.map { e =>
      val t = micros(e.ts)
      val isStart = st == null || t - st.lastTs > gapMicros
      val seq = if (st == null) 1L else if (isStart) st.sessionSeq + 1 else st.sessionSeq
      val isNewUser = st == null && !hadState
      val changed = st != null && st.lastEventType != null && st.lastEventType != e.event_type
      val lastPurchase =
        if (e.event_type == "purchase") Some(e.value)
        else if (st == null) None
        else st.lastPurchaseValue
      val inSession = if (isStart) 1L else st.eventsInSession + 1
      st = SessionState(userId, seq, t, e.event_type, lastPurchase, inSession)
      SessionizedEvent(
        e.event_id, e.ts, e.user_id, e.event_type, e.value,
        seq, s"$userId-$seq", isStart, isNewUser, changed, lastPurchase, inSession)
    }
    (out, st)
  }

  /** State transition for one user and one micro-batch of its events.
    * Events are sorted by (ts, event_id) within the batch; cross-batch
    * order is the stream's responsibility (watermark + source order).
    */
  def updateUser(gapMinutes: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionizedEvent] = {
    if (state.hasTimedOut) {
      // Inactivity beyond the watermark horizon: the session can never be
      // extended again, so the key's state is dropped — this is what keeps
      // total state size O(active users), not O(all users ever seen).
      state.remove()
      Iterator.empty
    } else {
      val (out, st) = transition(gapMinutes, userId, events, state.getOption.orNull)
      if (st != null) {
        state.update(st)
        watermarkMs(state).foreach { wm =>
          // evict state once no event can arrive inside the gap anymore;
          // clamp above the current watermark (required by the API when a
          // key's last event is already older than the watermark)
          val timeoutAt = st.lastTs / 1000L + gapMinutes * 60L * 1000L
          state.setTimeoutTimestamp(math.max(timeoutAt, wm + 1L))
        }
      }
      out.iterator
    }
  }

  /** Event-time timeouts need a watermark; None when running in NoTimeout
    * mode (tests), where no eviction timer is set.
    */
  private def watermarkMs(state: GroupState[SessionState]): Option[Long] =
    try Some(state.getCurrentWatermarkMs())
    catch { case _: UnsupportedOperationException => None }

  implicit private val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit private val outEnc: Encoder[SessionizedEvent] = Encoders.product[SessionizedEvent]

  /** Sessionize a (streaming or batch) Dataset[Event]. For production use
    * `withWatermark("ts", gap)` upstream and `eventTimeTimeout = true` so
    * idle keys are evicted; tests run with NoTimeout.
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Long = DefaultGapMinutes,
      eventTimeTimeout: Boolean = false): Dataset[SessionizedEvent] = {
    val timeout =
      if (eventTimeTimeout) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(updateUser(gapMinutes))
  }

  /** The same pipeline on Spark 4's arbitrary-state v2 API
    * (`transformWithState` + `StatefulProcessor` + typed `ValueState`) —
    * the successor to `flatMapGroupsWithState`, designed for the RocksDB
    * state store (requires
    * `spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`).
    * Shares [[transition]] with the v1 front, so both produce identical
    * output (asserted in `StreamingSpec`).
    */
  def sessionizeTws(
      events: Dataset[Event],
      gapMinutes: Long = DefaultGapMinutes): Dataset[SessionizedEvent] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new SessionProcessor(gapMinutes),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())(outEnc)

  implicit private val closedEnc: Encoder[ClosedSession] =
    Encoders.product[ClosedSession]

  /** Session FINALIZATION — the output the per-event fronts cannot give:
    * one record per session, emitted exactly when the session is KNOWN
    * closed. Two closure paths, both exercised:
    *  - an in-batch gap (the next event opens a later session) closes
    *    the superseded one immediately;
    *  - inactivity is closed by an EVENT-TIME TIMER at
    *    lastTs + gap — the transformWithState v2 timer API
    *    (registerTimer/handleExpiredTimer), which fires when the
    *    watermark passes the expiry and also EVICTS the key's state, so
    *    total state stays O(active users) — the contract the
    *    reference's Redis TTL only approximated. A user returning after
    *    eviction restarts at session 1 by design: the closure record is
    *    the durable artifact, not the in-store counter.
    */
  def sessionizeTwsClosed(
      events: Dataset[Event],
      gapMinutes: Long = DefaultGapMinutes,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new SessionCloseProcessor(gapMinutes),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())(closedEnc)
}

/** One finalized session: identity, how many events it absorbed, and
  * when it last saw one.
  */
case class ClosedSession(
    user_id: Long,
    session_seq: Long,
    session_id: String,
    n_events: Long,
    last_ts: Timestamp)

/** `StatefulProcessor` emitting [[ClosedSession]] records — in-batch gap
  * closures from the shared [[StreamingSessionizer.transition]] walk,
  * inactivity closures from event-time timers. At most ONE live timer
  * per key (superseded expiries are deleted on every update), so a
  * stale timer can never close a session that new events have extended.
  */
class SessionCloseProcessor(gapMinutes: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Event, ClosedSession] {

  @transient private var session: org.apache.spark.sql.streaming.ValueState[SessionState] = _

  override def init(
      outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    session = getHandle.getValueState[SessionState](
      "session", Encoders.product[SessionState],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  private def closed(userId: Long, seq: Long, n: Long, lastTsMicros: Long): ClosedSession = {
    // reconstruct the FULL microsecond value — a millisecond-only
    // Timestamp would break the streamed-equals-batch contract on
    // last_ts for sub-millisecond event times (batch emits exact max(ts))
    val t = new Timestamp(Math.floorDiv(lastTsMicros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(lastTsMicros, 1000000L) * 1000L).toInt)
    ClosedSession(userId, seq, s"$userId-$seq", n, t)
  }

  override def handleInputRows(
      userId: Long,
      rows: Iterator[Event],
      timers: org.apache.spark.sql.streaming.TimerValues): Iterator[ClosedSession] = {
    val initial = if (session.exists()) session.get() else null
    val (out, st) = StreamingSessionizer.transition(
      gapMinutes, userId, rows, initial)
    val closures = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    if (out.nonEmpty) {
      if (initial != null && out.head.session_seq > initial.sessionSeq)
        closures += closed(userId, initial.sessionSeq,
          initial.eventsInSession, initial.lastTs)
      var i = 1
      while (i < out.length) {
        if (out(i).session_seq > out(i - 1).session_seq)
          closures += closed(userId, out(i - 1).session_seq,
            out(i - 1).events_in_session,
            out(i - 1).ts.toInstant.getEpochSecond * 1000000L +
              out(i - 1).ts.toInstant.getNano / 1000L)
        i += 1
      }
    }
    if (st != null) {
      session.update(st)
      // exactly one live timer per key: the gap deadline of the LATEST
      // event; every superseded deadline dies here
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(st.lastTs / 1000L + gapMinutes * 60L * 1000L)
    }
    closures.iterator
  }

  override def handleExpiredTimer(
      userId: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ClosedSession] = {
    if (!session.exists()) Iterator.empty
    else {
      val st = session.get()
      // the one-live-timer discipline makes any firing timer the LATEST
      // deadline; the session is closed and the key's state evicted
      session.clear()
      Iterator.single(closed(userId, st.sessionSeq,
        st.eventsInSession, st.lastTs))
    }
  }
}

/** `StatefulProcessor` holding the per-user [[SessionState]] in a typed
  * `ValueState` — the state-store-native representation (no whole-state
  * re-serialization per key per batch; RocksDB holds it off-heap).
  */
class SessionProcessor(gapMinutes: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionizedEvent] {

  @transient private var session: org.apache.spark.sql.streaming.ValueState[SessionState] = _

  override def init(
      outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    session = getHandle.getValueState[SessionState](
      "session", Encoders.product[SessionState],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      userId: Long,
      rows: Iterator[Event],
      timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionizedEvent] = {
    val initial = if (session.exists()) session.get() else null
    val (out, st) = StreamingSessionizer.transition(gapMinutes, userId, rows, initial)
    if (st != null) session.update(st)
    out.iterator
  }
}
