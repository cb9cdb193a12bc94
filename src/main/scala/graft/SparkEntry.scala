package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Enrich, Relational}
import graft.session.{Sessionize, StateOps}

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

  private val Cutoff = "2024-01-15 00:00:00"

  private def qEnrich(s: SparkSession, dir: String): DataFrame =
    Enrich.enrichEvents(Tables.events(s, dir))

  private def qChangeDetect(s: SparkSession, dir: String): DataFrame =
    StateOps
      .changeDetect(Tables.events(s, dir), "event_type")
      .select("event_id", "user_id", "ts", "event_type",
        "prev_event_type", "event_type_changed")

  private def qCarryForward(s: SparkSession, dir: String): DataFrame =
    StateOps
      .carryForwardLastPurchase(Tables.events(s, dir))
      .select("event_id", "user_id", "ts", "event_type", "value",
        "last_purchase_value", "last_purchase_ts")

  private def qStateSnapshot(s: SparkSession, dir: String): DataFrame =
    StateOps
      .stateSnapshot(Tables.events(s, dir))
      .select("user_id", "event_id", "ts", "event_type", "value")

  private def qNewVsReturning(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cutoff = lit(Cutoff).cast("timestamp")
    val state = StateOps
      .stateSnapshot(ev.filter(col("ts") < cutoff))
      .select(col("user_id").as("u_id"), col("ts").as("state_ts"))
    StateOps
      .newVsReturning(ev.filter(col("ts") >= cutoff), state)
      .select("event_id", "user_id", "ts", "state_ts", "is_new")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sess_assign" -> (qSessionize _),
    "sess_stats" -> (qSessionStats _),
    "enrich" -> (qEnrich _),
    "change_detect" -> (qChangeDetect _),
    "carry_forward" -> (qCarryForward _),
    "state_snapshot" -> (qStateSnapshot _),
    "new_vs_returning" -> (qNewVsReturning _),
    "q1_pricing" -> (Relational.pricingSummary _),
    "q3_top_unshipped" -> (Relational.topUnshippedOrders(_, _)),
    "q5_local_supplier" -> (Relational.localSupplierVolume _),
    "topk_per_group" -> (Relational.topOrdersPerCustomer(_, _)),
    "window_ranks" -> (Relational.orderRanks _),
    "running_qty" -> (Relational.runningSupplierQty _),
    "semi_anti" -> (Relational.customersByOrderExistence _),
    "set_ops" -> (Relational.setOpsCustkeys _),
    "agg_order_stats" -> (Relational.orderStatusStats _),
    "distinct_pairs" -> (Relational.distinctStatusPriority _),
    "sort_limit" -> (Relational.topLineitemsByPrice _)
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
        |GROUP BY user_id, session_id""".stripMargin,
    "enrich" ->
      """WITH ua AS (
        |  SELECT *,
        |         CASE WHEN user_id % 6 = 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64)'
        |              WHEN user_id % 6 = 1 THEN 'Mozilla/5.0 (Linux; android 13; Pixel 7)'
        |              WHEN user_id % 6 = 2 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 16_0)'
        |              WHEN user_id % 6 = 3 THEN 'Mozilla/5.0 (iPad; CPU OS 16_0)'
        |              WHEN user_id % 6 = 4 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 13_0)'
        |              ELSE 'curl/8.0' END AS user_agent,
        |         CASE WHEN event_type IN ('click','view') THEN 'MOBILE'
        |              ELSE upper(event_type) END AS platform_raw
        |  FROM events
        |)
        |SELECT event_id, user_id, ts AS message_date, user_agent,
        |       CASE WHEN user_agent LIKE '%Windows%' THEN 'Windows PC'
        |            WHEN user_agent LIKE '%android%' THEN 'Android'
        |            WHEN user_agent LIKE '%iPhone%' THEN 'iPhone'
        |            WHEN user_agent LIKE '%iPad%' THEN 'iPad'
        |            WHEN user_agent LIKE '%Mac%' THEN 'iMac'
        |            ELSE 'Others' END AS device,
        |       CASE WHEN platform_raw = 'MOBILE' THEN 'MOBILE' ELSE 'WEB' END AS platform,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       ts AS last_visited
        |FROM ua""".stripMargin,
    "change_detect" ->
      """SELECT event_id, user_id, ts, event_type,
        |       lag(event_type) OVER w AS prev_event_type,
        |       CAST(CASE WHEN lag(event_type) OVER w IS NOT NULL
        |                      AND event_type <> lag(event_type) OVER w
        |                 THEN 1 ELSE 0 END AS BIGINT) AS event_type_changed
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "carry_forward" ->
      """SELECT event_id, user_id, ts, event_type, value,
        |       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |         OVER w AS last_purchase_value,
        |       last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
        |         OVER w AS last_purchase_ts
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "state_snapshot" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    "new_vs_returning" ->
      """WITH state AS (
        |  SELECT user_id AS u_id, ts AS state_ts FROM (
        |    SELECT user_id, ts,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events
        |    WHERE ts < TIMESTAMP '2024-01-15 00:00:00') t
        |  WHERE rn = 1
        |)
        |SELECT e.event_id, e.user_id, e.ts, s.state_ts,
        |       CAST(CASE WHEN s.u_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
        |FROM events e
        |LEFT JOIN state s
        |  ON trim(CAST(e.user_id AS VARCHAR)) = trim(CAST(s.u_id AS VARCHAR))
        |WHERE e.ts >= TIMESTAMP '2024-01-15 00:00:00'""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DECIMAL(38,4)) AS sum_disc_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |                * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
        |            AS DECIMAL(38,6)) AS sum_charge,
        |       AVG(l_quantity) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_unshipped" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |            AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |  FROM orders) t
        |WHERE rk <= 3""".stripMargin,
    "window_ranks" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       CAST(rank() OVER w AS INTEGER) AS price_rank,
        |       CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank,
        |       lag(o_totalprice) OVER w AS next_higher_price,
        |       lead(o_totalprice) OVER w AS next_lower_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "running_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        |       SUM(l_quantity) OVER (PARTITION BY l_suppkey
        |                             ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                             ROWS UNBOUNDED PRECEDING) AS running_qty
        |FROM lineitem""".stripMargin,
    "semi_anti" ->
      """SELECT c_custkey, CAST(1 AS BIGINT) AS has_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, CAST(0 AS BIGINT) AS has_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "set_ops" ->
      """(SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
        | INTERSECT
        | SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0)
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin,
    "agg_order_stats" ->
      """SELECT o_orderstatus,
        |       COUNT(*) AS n_orders,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       MIN(o_totalprice) AS min_price,
        |       MAX(o_totalprice) AS max_price,
        |       MIN(o_orderdate) AS first_order,
        |       MAX(o_orderdate) AS last_order
        |FROM orders
        |GROUP BY o_orderstatus""".stripMargin,
    "distinct_pairs" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin
  )
}
