package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The generic relational surface (SURVEY.md §2f): the reference itself has
  * no aggregations/windows/set-ops, but its architecture persists a
  * time-series explicitly for downstream analytics ("Time series" +
  * "Monitors" in the reference's architecture slide) — this module is that
  * analytics surface, all built-ins, all Catalyst-planned.
  *
  * Scale notes baked into the shapes below:
  *  - joins hint `broadcast()` ONLY on dimensions that are bounded-small
  *    by construction (nation, region, predicate-filtered part). Sides
  *    that scale with the data (customer, supplier, unfiltered part) are
  *    left to AQE's runtime sizing: broadcast when actually small,
  *    shuffle when not — a pinned hint would OOM the build side at 100 TB;
  *  - money aggregates are decimal (exact, order-independent) — required
  *    both for oracle parity and for reproducible results under AQE
  *    re-partitioning;
  *  - top-k is window row_number + filter, not sort-all + limit, so each
  *    partition prunes before the final merge.
  */
object Relational {

  /** Exact decimal view of a money double. DECIMAL(12,2) keeps every
    * product chain below Spark's and DuckDB's 38-digit cap, so no
    * intermediate ever rounds — results are exact and therefore identical
    * across engines and across partition orders.
    */
  private def money(c: Column): Column = c.cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(12,2)")
  /** disc-price term: ep * (1 - disc), exact at scale 4. */
  private def discPrice: Column = money(col("l_extendedprice")) * (one - money(col("l_discount")))

  /** TPC-H Q1-style pricing summary: one shuffle, partial aggregation
    * map-side, 6 aggregates over ~4 groups.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        // sums stay decimal (exact, partial-agg-order-independent); the
        // FINAL cast to double is deterministic and keeps the output type
        // engine-portable (decimal formatting differs across readers).
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(discPrice * (one + money(col("l_tax"))))
          .cast("double").as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: segment customers' unshipped orders, top 10 by
    * revenue. All joins left to AQE: the filtered customer side is
    * runtime-converted to broadcast when it fits, shuffled when the
    * segment is large — it scales with SF, so no pinned hint.
    */
  def topUnshippedOrders(s: SparkSession, dir: String): DataFrame = {
    val d = lit("1998-01-01 00:00:00").cast("timestamp")
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < d)
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > d)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation for one region/year, customer and
    * supplier in the same nation.
    *
    * Join ORDER is the scale lever here: the region restriction ("ASIA")
    * selects ~1/5 of nations, so it must reach customer and supplier
    * BEFORE they meet the fact table — without CBO stats Catalyst will
    * not reorder a join chain on its own. So: derive the ASIA nationkeys
    * first (nation⋈region, a ≤25-row broadcast), semi-join customer down
    * to ~1/5 and restrict supplier likewise, and only then run the two
    * fact joins. The dimension restriction is a broadcast (no shuffle);
    * the expensive shuffles see pre-filtered inputs.
    */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01 00:00:00").cast("timestamp")
    val hi = lit("1997-01-01 00:00:00").cast("timestamp")
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(asiaNations.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** Top-3 orders per customer — window row_number, partition-local prune
    * before any global work.
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Ranking/navigation window functions over orders per customer. */
  def orderRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      rank().over(w).as("price_rank"),
      dense_rank().over(w).as("price_dense_rank"),
      lag(col("o_totalprice"), 1).over(w).as("next_higher_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_lower_price"))
  }

  /** Running per-supplier quantity — frame-bounded window aggregation.
    * (l_orderkey, l_linenumber) is NOT unique in the generated lineitem,
    * so l_quantity joins the sort: any rows still tied are then identical
    * in every sum-relevant column and the prefix is deterministic under
    * every engine's (parallel, tie-arbitrary) window execution.
    */
  def runningSupplierQty(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
      col("l_quantity"), sum(col("l_quantity")).over(w).as("running_qty"))
  }

  /** Semi/anti join split: every customer tagged by order existence.
    * Plans as BroadcastHashJoin(LeftSemi/LeftAnti) on the distinct key set.
    */
  def customersByOrderExistence(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir).select(col("o_custkey"))
    val semi = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(1L).as("has_orders"))
    val anti = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(0L).as("has_orders"))
    semi.unionAll(anti)
  }

  /** Set operations: big spenders ∩ positive balance ∖ MACHINERY segment. */
  def setOpsCustkeys(s: SparkSession, dir: String): DataFrame = {
    val spenders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("custkey"))
    val positive = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0.0)
      .select(col("c_custkey").as("custkey"))
    val machinery = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
    spenders.intersect(positive).except(machinery)
  }

  /** Grouped multi-aggregate over orders (count / distinct / min / max). */
  def orderStatusStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))

  /** DISTINCT projection (dedup by all columns). */
  def distinctStatusPriority(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()

  /** TPC-H Q4-style: order-priority counts for orders with at least one
    * late lineitem — a left-semi join expressing EXISTS.
    */
  def latePriorityCounts(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** GROUP BY ROLLUP — hierarchical subtotals in one pass. */
  def rollupStatusPriority(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("sum_price"))

  /** GROUP BY CUBE — all grouping-set combinations. */
  def cubeFlags(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"))

  /** PIVOT: order counts per priority with one column per status. `sum(1)`
    * (not count) so absent combinations are NULL in both engines.
    */
  def pivotStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(sum(lit(1L)))

  /** Scalar-subquery shape: orders above the global average price. The
    * single-row aggregate is broadcast — no shuffle of the fact side.
    */
  def aboveAvgOrders(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val avgPrice = ord.agg(avg(col("o_totalprice")).as("avg_price"))
    ord.crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** TPC-H Q18-style: customers with any big order (HAVING over a join,
    * then a second aggregation per customer).
    */
  def bigOrderCustomers(s: SparkSession, dir: String, minQty: Double = 150.0): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big_orders"), sum(col("total_qty")).as("sum_qty"))
  }

  /** GROUPING SETS with grouping_id — the general form rollup/cube
    * specialize. SQL text (the DSL has no grouping-sets builder).
    */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** TPC-H Q19-style disjunctive predicate — exercises OR-tree pushdown
    * and CNF handling at the scan.
    */
  def disjunctiveFilter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        (col("l_quantity") >= 1.0 && col("l_quantity") <= 11.0 && col("l_discount") >= 0.05) ||
        (col("l_quantity") >= 30.0 && col("l_quantity") <= 50.0 && col("l_discount") <= 0.02) ||
        (col("l_returnflag") === "R" && col("l_tax") === 0.0))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_price"))

  /** Multiset set-ops (INTERSECT ALL / EXCEPT ALL keep duplicates). */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val highPri = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_custkey").as("custkey"))
    val open = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    highPri.intersectAll(open).exceptAll(
      Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("custkey")))
  }

  /** TPC-H Q6-style forecast revenue: pure filter + global aggregate. The
    * whole query is one parquet scan with every predicate pushed to the
    * reader — the shape that must stream at 100 TB with zero shuffle
    * (partial agg per partition, single-row final merge).
    */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
        col("l_quantity") < 24.0)
      .agg(
        sum(money(col("l_extendedprice")) * money(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q7-style bilateral volume: supplier nation ↔ customer nation
    * trade for one nation pair, by year. Both nation dims broadcast twice
    * under different aliases; only the lineitem⋈orders join shuffles.
    */
  def nationVolume(s: SparkSession, dir: String): DataFrame = {
    // the two-nation restriction (2 of 25 nations, ~8% of each dimension)
    // hits supplier AND customer BEFORE either meets a fact table — the
    // same join-order discipline as localSupplierVolume: the lineitem ⋈
    // supplier join then feeds ~8% of lineitem into the orders shuffle
    // instead of 100%, and only the cross-pair filter remains at the top
    val pairNations = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(pairNations.select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(pairNations.select(col("n_nationkey").as("c_nkey"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("c_nkey"))
      .select(col("c_custkey"), col("cust_nation"))
    Tables.lineitem(s, dir)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** TPC-H Q10-style returned-item report: top 20 customers by revenue
    * lost to returns in one quarter. Orders is filtered BEFORE the join so
    * AQE can shrink the shuffle; customer/nation broadcast.
    */
  def returnedItemReport(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01 00:00:00").cast("timestamp")
    val hi = lit("1996-04-01 00:00:00").cast("timestamp")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-style promo share: conditional aggregate over a
    * lineitem⋈part month slice. Part is broadcast; the share is a ratio of
    * two exact decimal sums, divided once as doubles (deterministic).
    */
  def promoShare(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-03-01 00:00:00").cast("timestamp")
    val hi = lit("1996-04-01 00:00:00").cast("timestamp")
    // no otherwise: SUM skips nulls, same as SQL's CASE WHEN without ELSE
    val promo = when(col("p_type") === "ECONOMY", discPrice)
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(promo).cast("double").as("promo_revenue"),
        sum(discPrice).cast("double").as("total_revenue"))
      .select(
        col("promo_revenue"),
        col("total_revenue"),
        (col("promo_revenue") * lit(100.0) / col("total_revenue")).as("promo_share"))
  }

  /** TPC-H Q19-style bracket join: equi-key join with an OR-of-conjunctions
    * residual. The shared `l_partkey = p_partkey` term keeps this a HASH
    * join (the OR tree becomes the join's residual filter) — the
    * OR-in-join-condition shape that degrades to a nested-loop join when
    * no common equi term exists. The build side is pre-filtered with the
    * part-only projection of the OR tree (a superset of the join-relevant
    * parts), so broadcasting it is safe at any SF — three brands of the
    * part table, not the whole table.
    */
  def bracketJoin(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir).filter(
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 25)))
    Tables.lineitem(s, dir)
      .join(broadcast(parts),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 1.0 && col("l_quantity") <= 11.0) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 10.0 && col("l_quantity") <= 20.0) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 25) &&
            col("l_quantity") >= 20.0 && col("l_quantity") <= 30.0)))
      .agg(
        sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8-style market share: the share of one supplier nation in a
    * customer region's revenue, by year. Share = ratio of two exact
    * decimal sums, divided once as doubles.
    *
    * Join order is the selective-dimension pattern of
    * [[localSupplierVolume]]: ASIA keeps only ~1/5 of nations, and the
    * restriction is a pure FILTER here (no ASIA column reaches the
    * output), so it must shrink the fact side BEFORE the expensive joins —
    * ASIA nationkeys (a ≤25-row broadcast) semi-join customer, the
    * surviving custkeys semi-join orders, and only then does lineitem meet
    * orders: both sides of the big shuffle are ~1/5 pre-filtered. Without
    * CBO stats Catalyst will not reorder this on its own. The
    * supplier-nation lookup stays a plain broadcast join — it feeds the
    * volume split, not a filter.
    */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaKeys = regionNationKeys(s, dir, "ASIA")
    val cust = Tables.customer(s, dir)
      .join(broadcast(asiaKeys), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"))
    val ordAsia = Tables.orders(s, dir)
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderdate"))
    val natS = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val vol = when(col("supp_nation") === "NATION_1", discPrice)
    Tables.lineitem(s, dir)
      .join(ordAsia, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(vol).cast("double").as("nation_volume"),
        sum(discPrice).cast("double").as("total_volume"))
      .select(col("o_year"),
        coalesce(col("nation_volume"), lit(0.0)).as("nation_volume"),
        col("total_volume"),
        (coalesce(col("nation_volume"), lit(0.0)) / col("total_volume")).as("mkt_share"))
  }

  /** TPC-H Q17-style small-quantity revenue: the classic CORRELATED
    * scalar subquery (`l_quantity < 0.2 * avg per part`), decorrelated the
    * way Catalyst itself would — one per-part aggregate joined back to the
    * fact. avg over integer-valued quantities is exact in both engines.
    *
    * The per-part average only depends on that part's own lineitem rows,
    * so restricting lineitem to the Brand#1 parts (a broadcast semi-join,
    * ~1/25 of the part table) BEFORE the aggregate is semantics-preserving
    * and shrinks the biggest shuffle in the query ~25×: the unrestricted
    * form aggregates every part's rows and then discards 24/25 of the
    * groups at the join.
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(s, dir).filter(col("p_brand") === "Brand#1")
    val li = Tables.lineitem(s, dir)
      .join(broadcast(brandParts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val thresh = li
      .groupBy(col("l_partkey").as("t_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_thresh"))
    li
      .join(thresh, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg(
        (sum(money(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** Bounded sliding window: centered 5-row average price per customer
    * (ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) — the moving-average frame
    * shape, decimal-sum / count so the ratio is deterministic.
    */
  def slidingAvgPrice(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, 2)
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      (sum(col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double")
        / count(lit(1)).over(w)).as("sliding_avg_price"),
      count(lit(1)).over(w).as("n_in_frame"))
  }

  /** TPC-H Q13-style order-count distribution: left join keeps
    * zero-order customers, two cascaded aggregations (per-customer count,
    * then histogram of counts). The second groupBy shuffles one row per
    * customer; the first is the only fact-table shuffle.
    */
  def customerDistribution(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Deterministic arg-max per group: the struct-max idiom. Plain
    * `max_by` is nondeterministic on ties; `max(struct(price, key))`
    * totally orders candidates (price, then key), so the winner is
    * reproducible across partitionings and engines. One shuffle,
    * map-side partial max.
    */
  def topOrderPerStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"))
      .select(
        col("o_orderstatus"),
        col("m.o_orderkey").as("top_orderkey"),
        col("m.o_totalprice").as("top_price"))

  /** Full outer join of two derived key sets (negative-balance customers
    * vs big-order makers) — exercises null fill-in on BOTH sides. Plans
    * as shuffle join at scale; no broadcast (outer joins can't broadcast
    * the preserved side).
    */
  def balanceVsBigOrders(s: SparkSession, dir: String): DataFrame = {
    val neg = Tables.customer(s, dir)
      .filter(col("c_acctbal") < 0.0)
      .select(col("c_custkey"), col("c_acctbal"))
    val big = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 300000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big_orders"))
    neg.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"),
        col("n_big_orders"))
  }

  /** Global sort + limit (comparison-only on doubles — exact). */
  def topLineitemsByPrice(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_shipdate"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  /** TPC-H Q15-style top supplier: a derived revenue "view" (quarterly
    * revenue per supplier), its global max, and the join back — the
    * view + scalar-subquery shape. The revenue relation is ≤|supplier|
    * rows however large lineitem is, so the max is a 1-row broadcast and
    * the join-back never shuffles the fact table twice. Revenue is an
    * exact decimal sum cast to double ONCE on each side, so the equality
    * join on the max is bit-safe.
    */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01 00:00:00").cast("timestamp")
    val hi = lit("1996-04-01 00:00:00").cast("timestamp")
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice).cast("double").as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q12-style shipping-priority split (adapted: the generated
    * lineitem has no shipmode/commitdate/receiptdate, so "late" is
    * shipped ≥60 days after the order date and the grouping dimension is
    * l_linestatus). The conditional-count pair over a fact⋈fact join is
    * the shape under test; both counts come out of ONE pass.
    */
  def lateLinesByStatus(s: SparkSession, dir: String): DataFrame = {
    val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(highPri, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(highPri, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q18-style large-volume orders: HAVING over a fact aggregate,
    * join back to orders and customer, top 100. The per-order aggregate
    * is the only fact shuffle; orders/customer join a ≤|orders|-row
    * filtered relation, and the final top-100 is TakeOrdered (per-partition
    * prune, no global sort).
    */
  def largeOrders(s: SparkSession, dir: String, minQty: Double = 150.0): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q21-style suppliers-who-kept-orders-waiting (adapted: "late" is
    * shipped ≥30 days after the order date). The textbook form is a
    * correlated EXISTS + NOT-EXISTS pair — two extra scans of the fact
    * table. Here both are decorrelated into ONE per-order aggregate:
    * an order blames supplier k iff it has >1 distinct supplier and k is
    * its only late one, which `countDistinct` + a conditional
    * `min` answer in a single pass. The DuckDB oracle keeps the literal
    * EXISTS/NOT EXISTS formulation, so the gate proves the decorrelation
    * equivalent, not just self-consistent.
    */
  def waitingSupplier(s: SparkSession, dir: String): DataFrame =
    waitingSupplierFrom(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.supplier(s, dir))

  /** [[waitingSupplier]] over caller-supplied frames — the seam that lets
    * the same plan run on a BUCKETED layout: with lineitem and orders both
    * bucketed (and sorted) by their orderkey, the fact–fact join needs no
    * exchange and no sort, and the per-order aggregate reuses the bucket
    * partitioning (the layout a real 100 TB deployment picks for
    * orderkey-scoped workloads; measured in BENCH_SF1).
    */
  def waitingSupplierFrom(
      lineitem: DataFrame, orders: DataFrame, supplier: DataFrame): DataFrame = {
    val late = col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAYS")
    val perOrder = lineitem
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("late"))
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"),
        min(when(col("late"), col("l_suppkey"))).as("blame_supp"))
    perOrder
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .groupBy(col("blame_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(supplier, col("blame_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q9-style product-type profit (p_retailprice plays partsupp's
    * ps_supplycost — the dataset has no partsupp): per supplier nation and
    * order year, sum of `disc_price − retailprice·quantity` over parts
    * named `red%`. The whole amount stays in exact decimal arithmetic
    * until the final double cast — per-group unscaled magnitude is ~2e12,
    * far under the 2⁵³ cross-engine boundary. Join order: the ~1/8 part
    * restriction broadcast-shrinks lineitem BEFORE the orders join (the
    * only fact-fact shuffle), supplier-nation rides a broadcast.
    */
  def productProfit(s: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(s, dir).filter(col("p_name").like("red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val natS = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(natS), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount =
      discPrice - money(col("p_retailprice")) * money(col("l_quantity"))
    Tables.lineitem(s, dir)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11-style important parts: EUROPE-supplied parts whose revenue
    * exceeds 1.5× the mean per-part revenue — Q11's
    * HAVING-against-a-global-scalar-aggregate shape with a SCALE-FREE
    * threshold (Q11's literal `0.0001` fraction must shrink with SF to
    * select anything; a mean-relative cut selects a stable tail at every
    * size). The comparison is cross-multiplied into pure decimal×integer
    * arithmetic (`val·n·2 > total·3`) — no double division to flip
    * boundary rows across engines. The per-part aggregate subtree appears
    * under both the rows and the 1-row total; Spark's exchange reuse
    * evaluates the shuffle once.
    */
  def importantParts(s: SparkSession, dir: String): DataFrame = {
    val eurKeys = regionNationKeys(s, dir, "EUROPE")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(eurKeys), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"))
    val pv = Tables.lineitem(s, dir)
      .join(sup, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(discPrice).as("val"))
    val tot = pv.agg(sum(col("val")).as("total"), count(lit(1)).as("n"))
    pv.crossJoin(broadcast(tot))
      // widths chosen so BOTH engines multiply exactly: val(25,4)×2n(11,0)
      // is 37 digits in Spark (p1+p2+1) and 36 in DuckDB (p1+p2), both
      // under the 38 cap — without the casts Spark would round via
      // precision-loss decimal while DuckDB converts to double, and a
      // boundary part could flip between engines. The down-casts are safe
      // to ~1e21 per-part revenue (far beyond 100 TB).
      .filter(
        col("val").cast("decimal(25,4)") * expr("cast(n * 2 as decimal(11,0))")
          > col("total").cast("decimal(27,4)") * lit(3).cast("decimal(1,0)"))
      .select(col("l_partkey"), col("val").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q16-style supplier-part-type counts: distinct suppliers per
    * (brand, type, size) over a NOT-LIKE / IN-list part restriction, with
    * Q16's NOT-IN-subquery supplier exclusion as a broadcast anti join.
    * Counts only — no float arithmetic to drift.
    */
  def supplierPartCounts(s: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(s, dir).filter(col("s_name").like("%7"))
      .select(col("s_suppkey"))
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%") &&
        col("p_size").isin(1, 5, 9, 12, 15, 20, 25, 30))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q2-style minimum-cost supplier (lineitem plays the partsupp
    * role — the dataset has no partsupp table): for each SMALL-type part,
    * every EUROPE supplier whose offer price equals that part's minimum
    * EUROPE offer price. The textbook form is a correlated scalar MIN
    * subquery re-evaluated per outer row; here it is decorrelated into ONE
    * per-part aggregate joined back on (partkey, price = min) — the same
    * offers frame feeds both sides, so the region/type restrictions are
    * applied once, before any per-part work. Join order: part-type filter
    * broadcast-restricts lineitem first (~1/6 of parts), EUROPE suppliers
    * restrict again (~1/5), so the per-part aggregate sees ~1/30 of the
    * fact table. `min` over doubles is exact (no accumulation) — safe for
    * the cross-engine hash. DISTINCT because a supplier can hit the same
    * min price on several lineitems; the (s_acctbal, n_name, s_name,
    * p_partkey) sort is total — (s_name, p_partkey) pairs are unique.
    */
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val eurNations = regionNations(s, dir, "EUROPE")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val smallParts = Tables.part(s, dir).filter(col("p_type") === "SMALL")
      .select(col("p_partkey"), col("p_name"))
    // one exchange under BOTH consumers: the min aggregate and the probe
    // side of the min-join read the same shuffle (exchange reuse), and the
    // final join is co-partitioned on p_partkey — without this the whole
    // lineitem join tree (all-broadcast, hence exchange-free) executes
    // twice
    val offers = Tables.lineitem(s, dir)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("s_acctbal"), col("n_name"), col("l_extendedprice").as("cost"))
      .repartition(col("p_partkey"))
    val minCost = offers
      .groupBy(col("p_partkey").as("m_key"))
      .agg(min(col("cost")).as("m_cost"))
    offers
      .join(minCost,
        col("p_partkey") === col("m_key") && col("cost") === col("m_cost"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("s_acctbal"), col("n_name"), col("cost").as("min_cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Nation rows of one region via the broadcast nation-region dimension
    * join — the shared feeder for the broadcast (semi-)joins that restrict
    * customer/supplier BEFORE they meet a fact table (the join-order
    * policy q2/q5/q8/q11/q20 follow; one definition so a change to the
    * pattern lands everywhere).
    */
  private def regionNations(s: SparkSession, dir: String, region: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))

  private def regionNationKeys(s: SparkSession, dir: String, region: String): DataFrame =
    regionNations(s, dir, region).select(col("n_nationkey"))

  /** TPC-H Q20-style excess shippers: EUROPE suppliers that moved more
    * than `minQty` units of some bolt part in 1996 — the nested
    * IN-over-a-per-(supplier,part)-aggregate shape (Q20's availqty
    * comparison, with lineitem standing in for partsupp). The IN becomes a
    * semi-join against the distinct qualifying suppkeys; the part-name
    * restriction broadcast-semi-joins lineitem BEFORE the aggregate and
    * the date filter pushes to the scan, so the per-(supplier,part)
    * aggregate runs over ~1/8 of one year of the fact table. sum over
    * integer-valued quantities is exact in both engines.
    */
  def excessShippers(s: SparkSession, dir: String, minQty: Double = 40.0): DataFrame = {
    val lo = lit("1996-01-01 00:00:00").cast("timestamp")
    val hi = lit("1997-01-01 00:00:00").cast("timestamp")
    val bolts = Tables.part(s, dir).filter(col("p_name").like("%bolt"))
      .select(col("p_partkey"))
    val heavy = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(bolts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("ship_qty"))
      .filter(col("ship_qty") > minQty)
      // no distinct: the left_semi consumer below already deduplicates
      .select(col("l_suppkey"))
    val eurKeys = regionNationKeys(s, dir, "EUROPE")
    Tables.supplier(s, dir)
      .join(broadcast(eurKeys), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q22-style global sales opportunity: country code from the
    * customer name suffix, customers above the average positive balance
    * with no PREMIUM order (totalprice > 450k). The textbook "no orders at
    * all" form is vacuous on this dataset — every generated customer has
    * orders, so both engines would return 0 rows and the oracle gate would
    * pass without testing the anti join or the balance comparison; the
    * premium-order variant keeps every structural element (left-anti on a
    * filtered order subset, cross-multiplied average, final aggregation)
    * live with non-empty results at every test SF. The average-balance
    * comparison is cross-multiplied (`bal * n > sum`) so it stays in exact
    * decimal arithmetic — a plain double `avg` differs by summation order
    * across engines and would flip rows sitting on the boundary. The 1-row
    * aggregate broadcasts; the anti join carries only the filtered
    * distinct o_custkey set (and the price filter pushes to the scan).
    */
  def globalSales(s: SparkSession, dir: String): DataFrame = {
    val codes = Seq("13", "31", "23", "29", "30", "18", "17")
    val cust = Tables.customer(s, dir)
      .select(expr("right(c_name, 2)").as("cntrycode"),
        col("c_custkey"), col("c_acctbal"))
      .filter(col("cntrycode").isin(codes: _*))
    val bal = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(money(col("c_acctbal"))).as("sum_bal"), count(lit(1)).as("n_bal"))
    cust.crossJoin(broadcast(bal))
      .filter(money(col("c_acctbal")) * col("n_bal") > col("sum_bal"))
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(money(col("c_acctbal"))).cast("double").as("totacctbal"))
  }

  /** Peak concurrency per key by sweep line — the interval-stabbing
    * question ops asks constantly (max simultaneous open orders /
    * sessions / connections) answered WITHOUT expanding intervals to
    * their covered days: each interval contributes +1 at its start and
    * −1 at its (exclusive) end, a per-(key, day) net collapses the
    * events, and a running sum over the ordered days is the live count
    * — 2 rows per interval whatever its length (the day-explode
    * alternative is O(Σ duration)). Emits each key's peak and the
    * FIRST day it is reached, keys with peak ≥ `minPeak`.
    *
    * Intervals derive deterministically from the row (orderkey-modulo
    * duration, the decoration convention) since the schema carries only
    * the start. Scale shape: one bounded (key, day) aggregate + one
    * window PARTITIONED BY KEY (per-customer series, never a global
    * sort) + the per-key max/first rollup on the same partitioning.
    */
  def peakConcurrency(s: SparkSession, dir: String, minPeak: Long = 2L): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey"),
      to_date(col("o_orderdate")).as("start_d"),
      date_add(to_date(col("o_orderdate")),
        (col("o_orderkey") % 14 + 1).cast("int")).as("end_d"))
    val pts = o.select(col("o_custkey"), col("start_d").as("d"), lit(1L).as("delta"))
      .unionAll(o.select(col("o_custkey"), col("end_d").as("d"), lit(-1L).as("delta")))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("d"))
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
    pts
      .groupBy(col("o_custkey"), col("d"))
      .agg(sum(col("delta")).as("net"))
      .withColumn("open", sum(col("net")).over(wRun))
      .withColumn("peak_open", max(col("open")).over(wKey))
      .filter(col("open") === col("peak_open") && col("peak_open") >= minPeak)
      .groupBy(col("o_custkey"))
      .agg(max(col("peak_open")).as("peak_open"),
        min(col("d")).cast("timestamp").as("peak_date"))
      .orderBy(col("o_custkey"))
  }

  /** Allen's interval algebra (Allen, "Maintaining Knowledge about
    * Temporal Intervals", CACM 1983) over the per-order lineitem
    * ship→receipt windows: every pair of intervals stands in EXACTLY one
    * of 13 mutually-exclusive relations (before/meets/overlaps/starts/
    * during/finishes, their six inverses, and equals). Classifying a
    * logistics table's interval pairs is the temporal-QA sweep behind
    * questions like "how often does a later line's shipment fully
    * contain an earlier one's" — and a correctness trap worth gating:
    * the boundary cases (meets vs overlaps, starts vs equals) differ by
    * a single `<` vs `≤` and silently miscount if any branch is wrong.
    * The CASE cascade proves exhaustiveness by construction: the
    * `unclassified` arm raises an error, so a non-total classification
    * fails loudly rather than dropping pairs.
    *
    * Mutual exclusivity holds for PROPER intervals (start < end) — the
    * fixture guarantees it with a 1–30-day transit. For degenerate
    * point intervals (start = end, which a caller-supplied table may
    * contain) Allen's 13 relations are not mutually exclusive and the
    * CASE order IS the tie-break, applied first-match-wins in the
    * written order (equals ≺ before ≺ after ≺ meets ≺ met_by ≺ starts ≺
    * … — e.g. point [5,5] vs [5,8] classifies as 'meets', not
    * 'starts'). The spec brute-force-pins this order over the full
    * dense micro-space including point intervals, so the degenerate
    * behavior is deterministic and oracle-mirrored, not accidental.
    *
    * Shapes: the pair space is the per-order self-join (TPC-H fanout ≤ 7
    * lines/order — Σ|order|² bounded), one equi-join on the order key,
    * then a 13-bucket aggregate. Nothing global, nothing collected.
    */
  def allenRelations(s: SparkSession, dir: String): DataFrame = {
    // the slim lineitem carries no receiptdate: the delivery window is
    // [shipdate, shipdate + transit] with a deterministic 1–30-day
    // transit from the line's keys (≥ 1 so every interval is PROPER and
    // the 13 relations are mutually exclusive), oracle-reproduced exactly
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_shipdate").cast("date").as("st"),
      expr("date_add(cast(l_shipdate as date), cast((l_partkey + l_suppkey) % 30 + 1 as int))").as("en"))
    val a = li.select(col("ok"), col("ln").as("ln_a"),
      col("st").as("as_"), col("en").as("ae"))
    val b = li.select(col("ok"), col("ln").as("ln_b"),
      col("st").as("bs"), col("en").as("be"))
    a.join(b, Seq("ok")).where(col("ln_a") < col("ln_b"))
      .withColumn("relation", expr(
        """CASE
          |  WHEN as_ = bs AND ae = be THEN 'equals'
          |  WHEN ae < bs THEN 'before'
          |  WHEN be < as_ THEN 'after'
          |  WHEN ae = bs THEN 'meets'
          |  WHEN be = as_ THEN 'met_by'
          |  WHEN as_ = bs AND ae < be THEN 'starts'
          |  WHEN as_ = bs AND ae > be THEN 'started_by'
          |  WHEN ae = be AND as_ > bs THEN 'finishes'
          |  WHEN ae = be AND as_ < bs THEN 'finished_by'
          |  WHEN as_ > bs AND ae < be THEN 'during'
          |  WHEN as_ < bs AND ae > be THEN 'contains'
          |  WHEN as_ < bs AND ae >= bs AND ae < be THEN 'overlaps'
          |  WHEN bs < as_ AND be >= as_ AND be < ae THEN 'overlapped_by'
          |  ELSE raise_error('allenRelations: non-exhaustive classification')
          |END""".stripMargin))
      .groupBy(col("relation"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
