package graft.session

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the analytic twin of the reference's stateful
  * streaming pipeline.
  *
  * The reference assigns session ids per event by joining each micro-batch
  * against per-user state in Redis and opening a new session when the
  * inactivity gap exceeds 30 minutes or `init_session` is set
  * (StructuredStreaming.scala:159-189; the gap test at :186 is
  * `(message_date - msg_date)/60 > 30` on string columns). Here the same
  * semantics are expressed declaratively with window functions, which lets
  * Catalyst plan it as a single pass: one shuffle on the user key, then
  * sorted within partitions — exactly the layout a 1000-executor cluster
  * wants (state never leaves the partition that owns the key).
  *
  * Determinism: the reference stamps wall-clock into session ids
  * (StructuredStreaming.scala:283-296, `"<userId>-<epochMillis>"` or a
  * random number). That is untestable; the new engine derives the id from
  * the data itself: `"<userId>-<sessionSeq>"` where sessionSeq is the
  * 1-based running count of session starts per user in event-time order.
  */
object Sessionize {

  private val MicrosPerMinute = 60L * 1000000L

  /** Assign a session id to every event.
    *
    * @param df       input with at least (userCol, tsCol, tieCol)
    * @param gapMin   inactivity gap in minutes that opens a new session
    *                 (reference uses 30, StructuredStreaming.scala:186)
    * @param initCol  optional boolean column forcing a new session
    *                 (reference `init_session`, StructuredStreaming.scala:163)
    */
  def withSessionIds(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapMin: Long = 30L,
      initCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val gapExceeded =
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapMin * MicrosPerMinute
    val forced = initCol.map(c => col(c) === true).getOrElse(lit(false))
    val isStart = when(prevTs.isNull || gapExceeded || forced, 1L).otherwise(0L)
    df.withColumn("session_start", isStart)
      .withColumn(
        "session_seq",
        sum(col("session_start"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(
        "session_id",
        concat(col(userCol).cast("string"), lit("-"), col("session_seq").cast("string")))
  }

  /** Tumbling-window counts — the `window()` streaming aggregation in its
    * batch form (identical semantics; the streaming twin just adds a
    * watermark). One shuffle on (bucket, type).
    */
  def tumblingCounts(
      df: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    df.groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("bucket_start"),
        col(typeCol), col("n_events"), col("sum_value"))

  /** Gap-based sessions via Spark's NATIVE `session_window` — the built-in
    * that supersedes the reference's manual 30-minute logic. Events whose
    * gap-extended windows overlap merge into one session; window end =
    * last event + gap. Cross-checked against the lag/cumsum formulation
    * by the DuckDB oracle.
    */
  def sessionWindowStats(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(userCol),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"))

  /** Native session windows with a DYNAMIC, row-dependent gap — a
    * purchase keeps the session alive 60 minutes, anything else 20:
    * the "checkout takes longer than browsing" timeout policy a fixed
    * gap cannot express. Spark's `session_window(ts, gapExpr)` runs the
    * same merging-window machinery (streaming-capable, state bounded
    * per live session); the oracle re-derives the merge with a running
    * MAX of per-row window ends (a session continues while the next
    * event starts at or before the furthest end seen — gaps are
    * per-ROW, so the plain lag-vs-gap test of the fixed variant is no
    * longer equivalent).
    */
  def sessionWindowDynamic(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val gap = when(col(typeCol) === "purchase", lit("60 minutes"))
      .otherwise(lit("20 minutes"))
    df.groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(userCol),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"))
  }

  /** Per-session rollup: event count, bounds, duration, purchase revenue.
    * This is the session *analytics* surface the reference only persists
    * for (the pptx shows "Time series" + "Monitors" downstream of
    * Cassandra) — a plain two-level aggregation, one shuffle on
    * (user, session).
    */
  def sessionStats(
      sessionized: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      purchaseType: String = "purchase",
      typeCol: String = "event_type"): DataFrame =
    sessionized
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start_ts"),
        max(col(tsCol)).as("session_end_ts"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"),
        // Decimal SUM internally: decimal addition is exact and therefore
        // independent of partial-aggregation order across partitions. The
        // FINAL cast to double is deterministic (same in every engine) and
        // keeps the output type portable — parquet decimal stringifies with
        // trailing zeros ('0.40') where float64 readers print '0.4'.
        sum(when(col(typeCol) === purchaseType, col(valueCol)).otherwise(lit(0.0))
          .cast("decimal(18,2)")).cast("double").as("purchase_value"))

  /** CLOSED sessions — the batch twin of
    * [[graft.streaming.SessionCloseProcessor]]'s timer-driven
    * finalization (the batch-twin-per-streaming-operator doctrine):
    * a session is closed if it was SUPERSEDED (a later session of the
    * same user exists — the stream's inline-closure path) or its gap
    * deadline (last event + gap) lies before the corpus horizon
    * (max ts − the watermark delay — the stream's timer path). Sessions
    * matching neither are OPEN and not emitted — exactly the rows the
    * streaming form has not closed yet. Rides [[withSessionIds]] + one
    * per-session aggregate with a user-bounded max; the horizon is a
    * 1-row broadcast.
    */
  def closedSessions(
      df: DataFrame,
      gapMin: Long = 30L,
      watermarkDelayMin: Long = 10L,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val perSession = withSessionIds(df, userCol, tsCol, tieCol, gapMin)
      .groupBy(col(userCol).as("user_id"), col("session_seq"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), max(col(tsCol)).as("last_ts"))
      .withColumn("_max_seq",
        max(col("session_seq")).over(Window.partitionBy(col("user_id"))))
    val horizon = df.agg(
      (unix_micros(max(col(tsCol))) - watermarkDelayMin * MicrosPerMinute)
        .as("wm_us"))
    perSession.crossJoin(broadcast(horizon))
      .where(col("session_seq") < col("_max_seq") ||
        unix_micros(col("last_ts")) + gapMin * MicrosPerMinute < col("wm_us"))
      .select(col("user_id"), col("session_seq"), col("session_id"),
        col("n_events"), col("last_ts"))
  }

  /** Bounce rate by session ENTRY event type — the landing-quality
    * metric: of the sessions that START with X, how many end after that
    * single event. Rides the gap-sessionizer: one per-session aggregate
    * (entry type = the min (ts, tie, type) struct's type — no second
    * window), then an entry-type fold; the rate is one IEEE division of
    * exact counts.
    */
  /** Session-depth histogram: how many sessions contain exactly n
    * events, with the rows they carry — the engagement-shape companion
    * to [[bounceRate]]'s entry-type cut (depth 1 here IS the total
    * bounce count). Per-session count then a ≤max-depth-row fold.
    */
  def sessionDepthHist(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapMin: Long = 30L): DataFrame =
    withSessionIds(events, userCol, tsCol, tieCol, gapMin)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_sessions"))
      .select(col("depth"), col("n_sessions"),
        (col("depth") * col("n_sessions")).cast("bigint").as("n_events"))

  def bounceRate(
      events: DataFrame,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapMin: Long = 30L): DataFrame =
    withSessionIds(events, userCol, tsCol, tieCol, gapMin)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col(tsCol), col(tieCol), col(typeCol).as("t")))
          .getField("t").as("entry_type"))
      .groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("bigint").as("n_bounces"))
      .withColumn("bounce_rate",
        col("n_bounces").cast("double") / col("n_sessions").cast("double"))
}
