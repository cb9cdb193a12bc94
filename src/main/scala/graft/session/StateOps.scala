package graft.session

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch/analytic twins of the reference's per-user state updates
  * (SURVEY.md §2e). The reference mutates a Redis hash row-by-row; here the
  * same semantics are window functions over (user, time) — one shuffle on
  * the user key, then everything is partition-local, which is the shape
  * that scales: state for a key never crosses executor boundaries.
  */
object StateOps {

  private def userWindow(userCol: String, tsCol: String, tieCol: String) =
    Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))

  /** ST3 — change detection: flag rows where a tracked field differs from
    * its previous per-user value (reference compares incoming partner
    * fields against Redis state, StructuredStreaming.scala:190-205,
    * via the Spark-2 `!==` operator).
    */
  def changeDetect(
      df: DataFrame,
      trackedCol: String,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = userWindow(userCol, tsCol, tieCol)
    val prev = lag(col(trackedCol), 1).over(w)
    df.withColumn(s"prev_$trackedCol", prev)
      .withColumn(
        s"${trackedCol}_changed",
        when(prev.isNotNull && col(trackedCol) =!= prev, 1L).otherwise(0L))
  }

  /** ST4 — conditional carry-forward: remember the last value/category seen
    * on a qualifying row (reference: cart_amount/category stick only on
    * `page_type = 'success'`, StructuredStreaming.scala:206-221). Expressed
    * as `last(_, ignoreNulls = true)` over the running per-user window.
    */
  def carryForwardLastPurchase(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type",
      valueCol: String = "value",
      qualifying: String = "purchase"): DataFrame = {
    val w = userWindow(userCol, tsCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qualVal = when(col(typeCol) === qualifying, col(valueCol))
    val qualTs = when(col(typeCol) === qualifying, col(tsCol))
    df.withColumn("last_purchase_value", last(qualVal, ignoreNulls = true).over(w))
      .withColumn("last_purchase_ts", last(qualTs, ignoreNulls = true).over(w))
  }

  /** ST5/ST6 — state snapshot: the latest event per user, i.e. what the
    * Redis hash would hold after replaying the table (unconditional
    * refresh fields, StructuredStreaming.scala:222-225; first-touch init
    * :167-178). One row per key.
    */
  def stateSnapshot(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** F1/F2/J1 — new-vs-returning split: left-join incoming events against a
    * prior-state snapshot on the trimmed user key (the reference trims both
    * sides, StructuredStreaming.scala:153) and flag rows with no prior
    * state (its `u_id.isNull` filter :158 ≡ left-anti). The snapshot side
    * is one row per user — small relative to the event stream — so it is
    * explicitly broadcast: at 100 TB the event side never shuffles.
    */
  def newVsReturning(
      incoming: DataFrame,
      state: DataFrame,
      userCol: String = "user_id",
      stateUserCol: String = "u_id"): DataFrame = {
    val joined = incoming.join(
      broadcast(state),
      trim(incoming(userCol).cast("string")) === trim(state(stateUserCol).cast("string")),
      "left")
    joined.withColumn(
      "is_new",
      when(state(stateUserCol).isNull, 1L).otherwise(0L))
  }

  /** Ordered funnel analysis: for each user, the FIRST time of each step
    * subject to the ordering constraint (step i+1 must occur at or after
    * the user's step-i time AND within the conversion window), plus the
    * completed stage depth — the standard product-analytics conversion
    * funnel. The window is what makes the funnel a funnel: without it,
    * any user who ever performs every event type trivially completes.
    *
    * Shape: one filtered aggregate per step (the `event_type` predicate
    * pushes to the scan, so each pass reads only that step's rows), each
    * joined on user_id — every aggregate and join shares the same key, so
    * the exchanges chain without re-partitioning, and the per-step frames
    * are one row per qualifying user (bounded by |users| at any event
    * volume). The sequential constraint is what makes this irreducible to
    * one conditional aggregate: "first click AFTER the first view" needs
    * the view time before clicks can be filtered.
    */
  def funnelSteps(
      events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      windowHours: Int = 24): DataFrame = {
    require(steps.nonEmpty)
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as(s"${steps.head}_ts"))
    val all = steps.drop(1).foldLeft((first, s"${steps.head}_ts")) {
      case ((acc, prevCol), step) =>
        val nxt = events
          .join(acc.select(col("user_id"), col(prevCol)), "user_id")
          .filter(col("event_type") === step && col("ts") >= col(prevCol) &&
            col("ts") <= col(prevCol) + expr(s"INTERVAL $windowHours HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"${step}_ts"))
        (acc.join(nxt, Seq("user_id"), "left"), s"${step}_ts")
    }._1
    val stage = steps.map(st => col(s"${st}_ts").isNotNull.cast("int")).reduce(_ + _)
    all.select(col("user_id") +: steps.map(st => col(s"${st}_ts")) :+ stage.as("stage"): _*)
  }

  /** Cohort retention grid: users grouped by first-seen week, counted as
    * retained in each subsequent week they were active — the standard
    * "do users come back" analysis. Two aggregates on the same user key
    * (first-seen, then activity weeks) and one distinct count per
    * (cohort, offset) cell; the grid is |cohorts|·|weeks| rows no matter
    * the event volume. Week arithmetic is integer epoch-day division —
    * identical in both engines, no timezone/DST edge.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weekOf = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c) / lit(7L * 24 * 3600 * 1000000)).cast("bigint")
    val firstSeen = events.groupBy(col("user_id"))
      .agg(min(weekOf(col("ts"))).as("cohort_week"))
    events.select(col("user_id"), weekOf(col("ts")).as("week"))
      .distinct()
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** RFM segmentation: per-user Recency (days since last event, against
    * the corpus max — data-derived so the result is reproducible),
    * Frequency (event count) and Monetary (summed value, exact decimal),
    * each bucketed into quartile segments by the corpus-wide exact
    * interpolated percentile boundaries (Spark `percentile` ==
    * DuckDB `quantile_cont`, the parity `price_percentiles` proves).
    *
    * Scale shape: an `ntile` window would sort ALL users on one
    * partition; instead the three boundary triples are ONE 1-row
    * aggregate broadcast back, and segment assignment is a pure
    * projection — nothing global but a 9-number row.
    */
  def rfmSegments(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(
      max(col("ts")).as("last_ts"),
      count(lit(1)).as("frequency"),
      sum(col("value").cast("decimal(18,2)")).as("monetary"))
    val withRef = perUser.crossJoin(
      broadcast(events.agg(max(col("ts")).as("ref_ts"))))
    val rec = withRef
      .withColumn("recency_days",
        floor((unix_micros(col("ref_ts")) - unix_micros(col("last_ts")))
          / lit(24L * 3600 * 1000000)).cast("bigint"))
      .withColumn("monetary", col("monetary").cast("double"))
    val bounds = rec.agg(
      expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("r_q"),
      expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("f_q"),
      expr("percentile(monetary, array(0.25, 0.5, 0.75))").as("m_q"))
    def tileExpr(metric: String, q: String) =
      s"cast(1 + if($metric > $q[0], 1, 0) + if($metric > $q[1], 1, 0) + if($metric > $q[2], 1, 0) as int)"
    rec.crossJoin(broadcast(bounds))
      .selectExpr(
        "user_id", "recency_days", "frequency", "monetary",
        // recency: lower = better = segment 1; frequency/monetary flipped
        // below so segment 1 is always "best"
        s"${tileExpr("recency_days", "r_q")} as r_seg",
        s"cast(5 - ${tileExpr("frequency", "f_q")} as int) as f_seg",
        s"cast(5 - ${tileExpr("monetary", "m_q")} as int) as m_seg")
      .orderBy(col("user_id"))
  }

  /** Marketing attribution — FIRST- and LAST-touch: for every purchase,
    * the user's earliest and latest preceding click/view inside a bounded
    * lookback window (unattributed purchases survive with NULLs, never
    * drop). Completes the product-analytics set (funnel → cohort → RFM →
    * attribution).
    *
    * Scale shape: the purchase⋈touch join is an equi-join on user_id with
    * the time bounds as residual, and the LOOKBACK BOUND is what makes it
    * scale — candidates per purchase are capped by one user-hour of
    * touches, not the user's whole history (an unbounded "any prior
    * touch" join grows quadratically in user lifetime). The two
    * row_number ranks share one purchase-keyed exchange, and ties break
    * on event_id so the pick is deterministic under any partitioning.
    */
  def attribution(events: DataFrame, lookbackSecs: Long = 3600): DataFrame = {
    val ev = events.withColumn("tus", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tus").as("p_tus"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("tus").as("t_tus"))
    val cand = purchases.join(touches, Seq("user_id"))
      .filter(col("t_tus") < col("p_tus") &&
        col("t_tus") >= col("p_tus") - lit(lookbackSecs * 1000000L))
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id")).orderBy(col("t_tus").desc, col("touch_id").desc)
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id")).orderBy(col("t_tus").asc, col("touch_id").asc)
    val attr = cand
      .withColumn("rn_last", row_number().over(wLast))
      .withColumn("rn_first", row_number().over(wFirst))
      .groupBy(col("purchase_id"))
      .agg(
        max(when(col("rn_first") === 1, col("touch_id"))).as("first_touch_id"),
        max(when(col("rn_last") === 1, col("touch_id"))).as("last_touch_id"),
        max(when(col("rn_last") === 1, col("touch_type"))).as("last_touch_type"),
        max(when(col("rn_last") === 1,
          (col("p_tus") - col("t_tus")).cast("double") / 1000000.0)).as("secs_since_last"))
    purchases
      .join(attr, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"),
        col("first_touch_id"), col("last_touch_id"),
        col("last_touch_type"), col("secs_since_last"))
  }

  /** Time-to-convert distribution: for each user with a `fromType` event
    * followed (or matched at the same instant) by a `toType` event, the
    * microsecond lag between the FIRST of each, summarized as exact
    * element quantiles (`Quality.quantileElements` — nothing
    * interpolates). The funnel-latency number next to `funnelSteps`'
    * conversion counts: not just HOW MANY convert, but how long they
    * take. One conditional-min aggregate per user, then the bounded
    * quantile window.
    */
  def conversionLag(
      events: DataFrame,
      fromType: String,
      toType: String,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      qPermille: Seq[Int] = Seq(250, 500, 750, 900)): DataFrame = {
    val lags = events
      .where(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(
        min(when(col(typeCol) === fromType, unix_micros(col(tsCol)))).as("first_from"),
        min(when(col(typeCol) === toType, unix_micros(col(tsCol)))).as("first_to"))
      .where(col("first_from").isNotNull && col("first_to").isNotNull &&
        col("first_to") >= col("first_from"))
      .select(lit(s"${fromType}_to_$toType").as("metric"),
        (col("first_to") - col("first_from")).as("lag_us"))
    graft.ops.Quality.quantileElements(lags, "metric", "lag_us", qPermille)
  }
}
