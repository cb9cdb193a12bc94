package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar/aggregate function surface beyond what the other modules already
  * exercise: string ops, date/time parts, array aggregation, exact
  * percentiles, HLL approximate distinct. All built-ins (codegen'd), all
  * single-shuffle-or-less.
  */
object Functions {

  /** String function sweep over customer names (upper/lower, substring,
    * regexp extraction, replace, length, coalesce/nullif).
    */
  def stringOps(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      col("c_name"),
      upper(col("c_name")).as("name_upper"),
      lower(col("c_name")).as("name_lower"),
      substring(col("c_name"), 1, 8).as("name_prefix"),
      length(col("c_name")).as("name_len"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
      concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"),
      coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("segment_or_other"))

  /** Date-part sweep over orders (year/month/day, day-of-week, quarter,
    * truncation, day difference against a fixed anchor).
    */
  def dateOps(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_orderdate"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      dayofmonth(col("o_orderdate")).as("order_day"),
      quarter(col("o_orderdate")).as("order_quarter"),
      dayofweek(col("o_orderdate")).as("order_dow"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_epoch"))

  /** Array aggregation: the sorted distinct event-type vocabulary per user
    * (deterministic by construction — collect_set order is not).
    */
  def arrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("event_types"))
      .select(
        col("user_id"),
        // serialized for the oracle compare (array columns don't hash
        // portably across engines); the array ops themselves are the point
        array_join(col("event_types"), ",").as("event_types_csv"),
        size(col("event_types")).as("n_types"),
        array_contains(col("event_types"), "purchase").as("has_purchase"),
        element_at(col("event_types"), 1).as("first_type"))

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`).
    */
  def pricePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        min(col("o_totalprice")).as("min_price"))

  /** HLL++ approximate distinct — the sketch the exact `countDistinct`
    * path can't afford at 100 TB. No DuckDB oracle (different sketch);
    * accuracy is asserted against the exact count in unit tests.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"))
}
