package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the correlation-of-two-live-streams surface
  * (reference behavior class: StructuredStreaming.scala's single-stream
  * pipeline never joins two streams; this is the natural extension a
  * funnel/attribution pipeline needs when impressions and conversions
  * arrive on separate topics).
  *
  * The SAME plan builder serves batch and streaming: on batch frames it
  * is a keyed hash join with a residual time-band filter (never a
  * cartesian — the user_id equality anchors the exchange); on streaming
  * frames Spark's stream-stream join machinery buffers both sides in
  * state and the REQUIRED watermark + time-band condition bound that
  * state: a click can only match a conversion within `maxGap`, so once
  * the watermark passes click.ts + maxGap the click's state row is
  * evicted. Without the band the state grows forever — that is why
  * [[clickToConversion]] bakes the band into the join condition rather
  * than taking an arbitrary predicate.
  *
  * 100 TB shape: both sides hash-partition on user_id (the stream-stream
  * join co-partitions state by key); state size is bounded by
  * events-per-key within the `maxGap` horizon, independent of stream
  * length. Skewed keys fall to the same salting playbook as batch joins.
  */
object StreamJoins {

  /** Pair each `click` with every `purchase` by the same user within
    * `(0, maxGap]` after it. Works on batch AND streaming frames; for
    * streaming, apply `withWatermark` on both sides BEFORE calling (the
    * caller owns lateness policy).
    *
    * Output: (user_id, click_id, purchase_id, gap_us) — the gap in exact
    * integer microseconds, engine-portable.
    */
  def clickToConversion(
      clicks: DataFrame,
      purchases: DataFrame,
      maxGap: String = "6 hours"): DataFrame =
    clicks.alias("c")
      .join(
        purchases.alias("p"),
        expr(s"""c.user_id = p.user_id
                | and p.ts >= c.ts
                | and p.ts <= c.ts + interval $maxGap""".stripMargin))
      .select(
        col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        (unix_micros(col("p.ts")) - unix_micros(col("c.ts"))).as("gap_us"))

  /** LEFT-OUTER variant of [[clickToConversion]]: every click appears,
    * unconverted ones with a NULL purchase — the funnel's drop-off side,
    * which the inner join silently discards. On streaming frames this is
    * Spark's watermarked outer stream-stream join: a click's null row is
    * emitted only once the watermark passes `click.ts + maxGap` (the
    * point where a match is provably impossible), so correctness and the
    * state bound come from the same band. Batch frames degrade to a
    * plain left join with the identical condition.
    */
  def clickToConversionOuter(
      clicks: DataFrame,
      purchases: DataFrame,
      maxGap: String = "6 hours"): DataFrame =
    clicks.alias("c")
      .join(
        purchases.alias("p"),
        expr(s"""c.user_id = p.user_id
                | and p.ts >= c.ts
                | and p.ts <= c.ts + interval $maxGap""".stripMargin),
        "left_outer")
      .select(
        col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        (unix_micros(col("p.ts")) - unix_micros(col("c.ts"))).as("gap_us"))

  /** The batch entry for the outer variant: all clicks, converted or not. */
  def intervalJoinOuter(events: DataFrame, maxGap: String = "6 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    clickToConversionOuter(clicks, purchases, maxGap)
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** The batch entry: click→purchase pairs from the events table. */
  def intervalJoinPairs(events: DataFrame, maxGap: String = "6 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    clickToConversion(clicks, purchases, maxGap)
      .orderBy(col("click_id"), col("purchase_id"))
  }
}
