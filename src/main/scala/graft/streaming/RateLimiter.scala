package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Event

/** Per-key admission decision: the input event plus whether it fit the
  * quota of its (key, tumbling event-time window). */
case class AdmitDecision(event_id: Long, user_id: Long, ts: Timestamp, admitted: Boolean)

/** Open quota windows for one key: (window start micros → admitted so
  * far). Bounded: windows fully below the watermark are pruned every
  * batch, so state is O(open windows per key), not O(stream length). */
case class QuotaState(windows: Seq[(Long, Int)])

/** Per-key, per-window rate limiting — the quota-enforcement operator a
  * shared ingest needs ("at most N events per user per hour; surface the
  * rest as throttled, don't drop them silently"). One logic, two fronts:
  *
  *  - BATCH ([[rateLimit]]): first-N-by-event-time per (key, window) via
  *    a partitioned `row_number` — deterministic, oracle-checkable, and
  *    the window key bounds the sort.
  *  - STREAMING ([[rateLimitStream]]): `flatMapGroupsWithState` holding
  *    per-open-window admitted counts. Admission is first-come within
  *    the watermark horizon (the only semantics an online limiter can
  *    have); with in-event-time-order delivery it equals the batch twin
  *    row for row, which is what the parity test pins.
  *
  * 100 TB shape: state co-partitions on the key; per-key state is the
  * handful of windows still above the watermark (pruned each batch, plus
  * event-time timeout eviction for idle keys — the sessionizer's
  * O(active keys) doctrine).
  */
object RateLimiter {

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Batch twin: admit the first `maxPer` events (by ts, then event_id)
    * of every (key, tumbling `windowSpec`) group. */
  def rateLimit(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      maxPer: Int,
      windowSpec: String = "hour"): DataFrame = {
    require(maxPer >= 1, s"maxPer must be >= 1, got $maxPer")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol), col("_win"))
      .orderBy(col(tsCol), col(idCol))
    df.withColumn("_win", date_trunc(windowSpec, col(tsCol)))
      .withColumn("_rn", row_number().over(w))
      .select(col(idCol), col(keyCol), col(tsCol),
        (col("_rn") <= maxPer).as("admitted"))
  }

  /** State transition for one key and one micro-batch of its events
    * (sorted by (ts, event_id) within the batch — cross-batch order is
    * the stream's responsibility). */
  def admitKey(maxPer: Int, windowMicros: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[QuotaState]): Iterator[AdmitDecision] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var wins = state.getOption.map(_.windows.toMap).getOrElse(Map.empty[Long, Int])
      val out = events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
        val w = math.floorDiv(micros(e.ts), windowMicros) * windowMicros
        val c = wins.getOrElse(w, 0)
        val ok = c < maxPer
        if (ok) wins += (w -> (c + 1))
        AdmitDecision(e.event_id, userId, e.ts, ok)
      }
      val wm = try Some(state.getCurrentWatermarkMs())
      catch { case _: UnsupportedOperationException => None }
      wm.foreach { wmMs =>
        // windows whose END is at or below the watermark can never admit
        // again — prune them; evict the whole key once it goes idle
        wins = wins.filter { case (ws, _) => ws + windowMicros > wmMs * 1000L }
        if (wins.nonEmpty)
          state.setTimeoutTimestamp(math.max(
            wins.keys.max / 1000L + windowMicros / 1000L, wmMs + 1L))
      }
      if (wins.isEmpty && wm.isDefined) state.remove()
      else state.update(QuotaState(wins.toSeq))
      out.iterator
    }
  }

  implicit private val stateEnc: Encoder[QuotaState] = Encoders.product[QuotaState]
  implicit private val outEnc: Encoder[AdmitDecision] = Encoders.product[AdmitDecision]

  /** Rate-limit a (streaming or batch) Dataset[Event]. For production,
    * `withWatermark("ts", …)` upstream and `eventTimeTimeout = true`. */
  def rateLimitStream(
      events: Dataset[Event],
      maxPer: Int,
      windowMicros: Long = 3600L * 1000000L,
      eventTimeTimeout: Boolean = false): Dataset[AdmitDecision] = {
    require(maxPer >= 1 && windowMicros >= 1)
    val timeout =
      if (eventTimeTimeout) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(admitKey(maxPer, windowMicros))
  }
}
