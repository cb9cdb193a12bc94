package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.session.Sessionize

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in `queries`
  * and, where ANSI-SQL-expressible, a DuckDB oracle in `oracleSql` over the
  * same parquet tables. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: 30-minute-gap sessionization of the event stream —
    * the batch twin of the reference's stateful pipeline
    * (StructuredStreaming.scala:159-189). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    qSessionize(spark, "/root/testdata/sf0.001")

  private def qSessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize
      .withSessionIds(Tables.events(s, dir))
      .select("event_id", "user_id", "ts", "session_start", "session_seq", "session_id")

  private def qSessionStats(s: SparkSession, dir: String): DataFrame =
    Sessionize
      .sessionStats(Sessionize.withSessionIds(Tables.events(s, dir)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sess_assign" -> (qSessionize _),
    "sess_stats" -> (qSessionStats _)
  )

  def oracleSql: Map[String, String] = Map(
    "sess_assign" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |              THEN 1 ELSE 0 END AS session_start
        |  FROM g
        |)
        |SELECT event_id, user_id, ts,
        |       CAST(session_start AS BIGINT) AS session_start,
        |       SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_seq,
        |       CAST(user_id AS VARCHAR) || '-' ||
        |         CAST(SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                       ROWS UNBOUNDED PRECEDING) AS VARCHAR)
        |         AS session_id
        |FROM s""".stripMargin,
    "sess_stats" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |                 THEN 1 ELSE 0 END AS session_start
        |  FROM g
        |), sess AS (
        |  SELECT *, CAST(user_id AS VARCHAR) || '-' ||
        |            CAST(SUM(session_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                          ROWS UNBOUNDED PRECEDING) AS VARCHAR)
        |            AS session_id
        |  FROM s
        |)
        |SELECT user_id, session_id,
        |       COUNT(*) AS n_events,
        |       MIN(ts) AS session_start_ts,
        |       MAX(ts) AS session_end_ts,
        |       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
        |       CAST(SUM(CASE WHEN event_type = 'purchase'
        |                     THEN CAST(value AS DECIMAL(18,2))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2))
        |         AS purchase_value
        |FROM sess
        |GROUP BY user_id, session_id""".stripMargin
  )
}
